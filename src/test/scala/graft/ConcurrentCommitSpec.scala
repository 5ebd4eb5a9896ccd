package graft

import org.apache.spark.sql.functions._

import graft.cdc.CdcApply
import graft.model.Corpus
import graft.table.LakeTable

/** Optimistic concurrency on the commit log: two writers racing the
  * same version must (a) both land when their buckets are disjoint
  * (loser rebuilds against the new head and re-publishes) and (b) fail
  * CLEANLY on a true conflict (overlapping buckets — the loser's data
  * files were derived from a stale snapshot), after which a redo
  * against the new snapshot succeeds. The race window is injected
  * deterministically via `testBeforePublish` (after the loser reads the
  * log, before it publishes). */
class ConcurrentCommitSpec extends SparkSpec {

  /** A small table with every bucket populated. */
  private def seeded(): (LakeTable, org.apache.spark.sql.DataFrame) = {
    val events = Corpus.changeEvents(spark, 600, nConvs = 30, maxTurns = 6)
    val table = new LakeTable(tmpDir("occ-table"), numBuckets = 8)
    CdcApply.applyBatch(spark, table, events, pruneBuckets = false)
    (table, events)
  }

  /** Write a one-row delta dir for `bucket` under the given version
    * name and return (relPath, rowCount, the row's conv_id, txid). */
  private def writeDelta(table: LakeTable, version: Long, bucket: Int,
      newText: String): (String, Long, String, Long) = {
    val tx = table.txidWatermark + 1
    val row = table.readBuckets(spark, Seq(bucket))
      .orderBy("conv_id", "turn_idx").limit(1)
      .withColumn("_txid", lit(tx))
      .withColumn("_etag", lit(s"occ-$version"))
      .withColumn("text", lit(newText))
    val rel = f"data/c$version%012dd/_bucket=$bucket"
    row.coalesce(1).write.mode("overwrite")
      .parquet(s"${table.location}/$rel")
    (rel, 1L, row.select("conv_id").head().getString(0), tx)
  }

  test("disjoint-bucket commits: the race loser retries and BOTH land") {
    val (table, _) = seeded()
    val v0 = table.currentCommit().get.version
    val schema = table.currentCommit().get.schema
    // writer B will land v0+1 inside A's publish window; A's retry
    // then lands v0+2 — dir names are version-aligned up front
    val b = new LakeTable(table.location, numBuckets = 8)
    val (relB, nB, convB, txB) = writeDelta(b, v0 + 1, bucket = 2, "from-B")
    val (relA, nA, convA, txA) = writeDelta(table, v0 + 2, bucket = 5, "from-A")
    table.testBeforePublish = () =>
      b.commitDelta(schema, Map(2 -> (relB, nB)), txB, -1L, Map("writer" -> 2L))
    table.commitDelta(schema, Map(5 -> (relA, nA)), txA, -1L, Map("writer" -> 1L))

    val head = table.currentCommit().get
    assert(head.version == v0 + 2, s"expected both commits, head=$head")
    assert(head.deltas("2") == Seq(relB.split("/").init.mkString("/")) ||
      head.deltas("2").head.startsWith(f"data/c${v0 + 1}%012dd"))
    assert(head.deltas("5").head.startsWith(f"data/c${v0 + 2}%012dd"))
    // both writers' rows are visible in the resolved read
    val texts = table.read(spark)
      .where(col("conv_id").isin(convA, convB) && col("_txid").isin(txA, txB))
      .select("text").collect().map(_.getString(0)).toSet
    assert(texts == Set("from-A", "from-B"), s"got $texts")
  }

  test("overlapping buckets: the loser refuses cleanly; a redo lands") {
    val (table, _) = seeded()
    val v0 = table.currentCommit().get.version
    val schema = table.currentCommit().get.schema
    val b = new LakeTable(table.location, numBuckets = 8)
    // both writers target bucket 3 — B wins the race, A must refuse
    val (relB, nB, _, txB) = writeDelta(b, v0 + 1, bucket = 3, "winner")
    val (relA, nA, _, txA) = writeDelta(table, v0 + 2, bucket = 3, "stale")
    table.testBeforePublish = () =>
      b.commitDelta(schema, Map(3 -> (relB, nB)), txB, -1L, Map.empty)
    val e = intercept[java.util.ConcurrentModificationException] {
      table.commitDelta(schema, Map(3 -> (relA, nA)), txA, -1L, Map.empty)
    }
    assert(e.getMessage.contains("buckets 3"), e.getMessage)
    assert(table.currentCommit().get.version == v0 + 1) // only B landed
    // redo against the new snapshot (fresh read → fresh delta) lands
    val (relA2, nA2, convA2, txA2) = writeDelta(table, v0 + 2, bucket = 3, "redo")
    table.commitDelta(schema, Map(3 -> (relA2, nA2)), txA2, -1L, Map.empty)
    assert(table.currentCommit().get.version == v0 + 2)
    val got = table.read(spark)
      .where(col("conv_id") === convA2 && col("_txid") === txA2)
      .select("text").head().getString(0)
    assert(got == "redo")
  }

  test("two first commits racing on an EMPTY table: overlap refuses, never composes") {
    // the conflict window's lower bound is version 0 (no commits read),
    // so the winner lands as log.head with NO retained predecessor —
    // modifiedBucketsSince must still count the head's own buckets, or
    // the loser's rewritten base pointer silently clobbers the winner's
    val loc = tmpDir("occ-empty")
    val a = new LakeTable(loc, numBuckets = 8)
    val b = new LakeTable(loc, numBuckets = 8)
    import spark.implicits._
    def writeBase(version: Long, text: String) = {
      val df = Seq(("c1", 0, text, version, s"e$version"))
        .toDF("conv_id", "turn_idx", "text", "_txid", "_etag")
      val rel = f"data/c$version%012d/_bucket=3"
      df.coalesce(1).write.mode("overwrite").parquet(s"$loc/$rel")
      (rel, df.schema)
    }
    val (relB, schema) = writeBase(1, "winner")
    val (relA, _) = writeBase(2, "stale")
    a.testBeforePublish = () =>
      b.commit(schema, Map(3 -> Some(relB)), Map(3 -> 1L), 1L, -1L, Map.empty)
    val e = intercept[java.util.ConcurrentModificationException] {
      a.commit(schema, Map(3 -> Some(relA)), Map(3 -> 1L), 2L, -1L, Map.empty)
    }
    assert(e.getMessage.contains("buckets 3"), e.getMessage)
    val head = a.currentCommit().get
    assert(head.version == 1L && head.buckets("3") == relB,
      s"winner's base pointer must survive, head=$head")
  }

  test("compaction racing the streaming tail's delta commit conflicts cleanly") {
    val (table, events) = seeded()
    val schema = table.currentCommit().get.schema
    val compactor = new LakeTable(table.location, numBuckets = 8)
    val v0 = table.currentCommit().get.version
    // tail prepares a delta for bucket 1; compaction (rewrites EVERY
    // bucket) lands first — the tail's commit must refuse, because its
    // gate read pre-compaction state of a bucket compaction rewrote
    val (relA, nA, _, txA) = writeDelta(table, v0 + 2, bucket = 1, "tail")
    table.testBeforePublish = () =>
      compactor.compact(spark, tombstoneHorizon = compactor.txidWatermark)
    intercept[java.util.ConcurrentModificationException] {
      table.commitDelta(schema, Map(1 -> (relA, nA)), txA, -1L, Map.empty)
    }
    // the compaction snapshot is intact and fully readable
    val after = table.currentCommit().get
    assert(after.metrics.contains("compaction"))
    assertSameRows(
      table.read(spark).select("conv_id", "turn_idx", "text"),
      Corpus.oracleFinalState(events).select("conv_id", "turn_idx", "text"))
  }

  test("rebucket racing the tail: stream wins, rebucket refuses then retries") {
    val (table, events) = seeded()
    val v0 = table.currentCommit().get.version
    val schema = table.currentCommit().get.schema
    val tail = new LakeTable(table.location, numBuckets = 8)
    // the tail lands a delta inside rebucket's publish window; rebucket
    // rewrites EVERY bucket, so its retry must see the overlap and
    // refuse — composing would resurrect the pre-delta bucket contents
    val (relB, nB, convB, txB) = writeDelta(tail, v0 + 1, bucket = 4, "tail-won")
    table.testBeforePublish = () =>
      tail.commitDelta(schema, Map(4 -> (relB, nB)), txB, -1L, Map.empty)
    intercept[java.util.ConcurrentModificationException] {
      table.rebucket(spark, 16)
    }
    assert(table.effectiveNumBuckets == 8, "failed rebucket must not change layout")
    // the retry re-reads the table INCLUDING the tail's delta and lands
    val c = table.rebucket(spark, 16)
    assert(c.metrics.get(LakeTable.NumBucketsKey).contains(16L))
    assert(table.effectiveNumBuckets == 16)
    val got = table.read(spark)
      .where(col("conv_id") === convB && col("_txid") === txB)
      .select("text").collect().map(_.getString(0)).toSeq
    assert(got == Seq("tail-won"), s"tail's delta lost by rebucket retry: $got")
    // no split hash space: every live base pointer comes from the
    // rebucket commit's layout
    val head = table.currentCommit().get
    assert(head.deltas.isEmpty)
    assert(head.buckets.keySet.forall(_.toInt < 16))
    assert(head.buckets.values.forall(_.startsWith(f"data/c${c.version}%012d")))
  }

  test("rebucket wins mid-flight; the stream's replayed batch re-reads the new layout") {
    val (table, events) = seeded()
    val v0 = table.currentCommit().get.version
    val schema = table.currentCommit().get.schema
    val maintenance = new LakeTable(table.location, numBuckets = 8)
    // the tail prepared a delta against the OLD 8-bucket layout;
    // rebucket(16) lands first — the tail's commit must refuse (its
    // bucket ids and dir keys mean nothing under the new layout)
    val (relA, nA, _, txA) = writeDelta(table, v0 + 2, bucket = 1, "stale-layout")
    table.testBeforePublish = () => { maintenance.rebucket(spark, 16); () }
    intercept[java.util.ConcurrentModificationException] {
      table.commitDelta(schema, Map(1 -> (relA, nA)), txA, -1L, Map.empty)
    }
    assert(table.effectiveNumBuckets == 16)
    // checkpoint replay redoes the batch against the CURRENT snapshot:
    // applyBatch hashes into the new 16-bucket space transparently
    val replayRow = table.readBuckets(spark, Seq(3))
      .orderBy("conv_id", "turn_idx").limit(1)
      .withColumn("_txid", lit(table.txidWatermark + 1))
      .withColumn("_op", lit("update"))
      .withColumn("_etag", lit("replayed"))
      .withColumn("text", lit("new-layout"))
      .drop("_deleted")
    CdcApply.applyBatch(spark, table, replayRow)
    val conv = replayRow.select("conv_id").head().getString(0)
    val got = table.read(spark).where(col("conv_id") === conv &&
      col("_etag") === "replayed").select("text").head().getString(0)
    assert(got == "new-layout")
    // never a split hash space: all data reachable, buckets within the
    // new layout, and the full resolved read still matches the oracle
    // for every untouched key
    val head = table.currentCommit().get
    assert((head.buckets.keySet ++ head.deltas.keySet).forall(_.toInt < 16))
    val turn = replayRow.select("turn_idx").head().getInt(0)
    assertSameRows(
      table.read(spark).where(!(col("conv_id") === conv && col("turn_idx") === turn))
        .select("conv_id", "turn_idx", "text"),
      Corpus.oracleFinalState(events)
        .where(!(col("conv_id") === conv && col("turn_idx") === turn))
        .select("conv_id", "turn_idx", "text"))
  }
}
