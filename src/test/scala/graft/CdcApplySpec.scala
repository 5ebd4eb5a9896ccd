package graft

import org.apache.spark.sql.functions._

import graft.cdc.CdcApply
import graft.model.Corpus
import graft.table.LakeTable

class CdcApplySpec extends SparkSpec {

  private def corpus(n: Long) =
    Corpus.changeEvents(spark, n, nConvs = 50, maxTurns = 10)

  private def finalPayload(t: LakeTable) =
    t.read(spark).select("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("single-batch replay matches the reference-semantics oracle") {
    val events = corpus(2000)
    val table = new LakeTable(tmpDir("single"), numBuckets = 16)
    val stats = CdcApply.applyBatch(spark, table, Corpus.shuffled(events))
    // `applied` counts effective per-key events: on an empty table every
    // distinct key's winner takes effect
    assert(stats.applied == events.select("conv_id", "turn_idx").distinct().count())
    assertSameRows(finalPayload(table), Corpus.oracleFinalState(events))
  }

  test("multi-batch incremental replay matches the oracle") {
    val events = corpus(3000)
    val table = new LakeTable(tmpDir("multi"), numBuckets = 16)
    CdcApply.replay(spark, table, events, nBatches = 5)
    assertSameRows(finalPayload(table), Corpus.oracleFinalState(events))
  }

  test("overlapping replay is idempotent (exactly-once via txid watermark)") {
    val events = corpus(1500)
    val table = new LakeTable(tmpDir("overlap"), numBuckets = 16)
    val b1 = events.where(col("_txid") <= 1000)
    val b2 = events.where(col("_txid") > 500) // overlaps 501..1000
    CdcApply.applyBatch(spark, table, b1)
    CdcApply.applyBatch(spark, table, b2)
    // replay everything again — must be a no-op
    val s3 = CdcApply.applyBatch(spark, table, events)
    assert(s3.applied == 0)
    assertSameRows(finalPayload(table), Corpus.oracleFinalState(events))
  }

  test("batchId replay short-circuits") {
    val events = corpus(500)
    val table = new LakeTable(tmpDir("batchid"), numBuckets = 8)
    CdcApply.applyBatch(spark, table, events, batchId = 7)
    val again = CdcApply.applyBatch(spark, table, events, batchId = 7)
    assert(again.skippedReplay)
  }

  test("schema evolution: tool column absent in early batches, widened later") {
    val events = corpus(2000)
    val early = events.where(col("_txid") <= 1000).drop("tool")
    val late = events.where(col("_txid") > 1000)
    val table = new LakeTable(tmpDir("evolve"), numBuckets = 16)
    val s1 = CdcApply.applyBatch(spark, table, early)
    assert(!table.currentCommit().get.schema.fieldNames.contains("tool"))
    CdcApply.applyBatch(spark, table, late)
    assert(table.currentCommit().get.schema.fieldNames.contains("tool"))
    assert(s1.version == 1)
    // oracle over the same effective input: early events had no tool
    val oracleInput = events.withColumn("tool",
      when(col("_txid") <= 1000, lit(null).cast("string")).otherwise(col("tool")))
    assertSameRows(finalPayload(table), Corpus.oracleFinalState(oracleInput))
  }

  test("deletes remove keys; fully-deleted buckets drop out of the snapshot") {
    import spark.implicits._
    val ins = Seq(
      (1L, "update", "e1", "convA", 0, "user", "hello", null: String, java.sql.Timestamp.valueOf("2014-03-11 00:00:01")),
      (2L, "update", "e2", "convB", 0, "user", "world", null: String, java.sql.Timestamp.valueOf("2014-03-11 00:00:02")))
      .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val del = Seq(
      (3L, "delete", "e3", "convA", 0, null: String, null: String, null: String, null: java.sql.Timestamp))
      .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val table = new LakeTable(tmpDir("delete"), numBuckets = 4)
    CdcApply.applyBatch(spark, table, ins)
    CdcApply.applyBatch(spark, table, del)
    val rows = finalPayload(table).collect()
    assert(rows.length == 1 && rows.head.getString(0) == "convB")
  }

  test("duplicated txids within a batch collapse to one application") {
    val events = corpus(1000) // corpus re-emits every 37th txid verbatim
    assert(events.count() > events.select("_txid").distinct().count())
    val table = new LakeTable(tmpDir("dups"), numBuckets = 8)
    CdcApply.applyBatch(spark, table, events)
    val st = finalPayload(table)
    assert(st.groupBy("conv_id", "turn_idx").count()
      .where(col("count") > 1).count() == 0)
    assertSameRows(st, Corpus.oracleFinalState(events))
  }

  test("type promotion on evolution: int payload column widens to double, then to string") {
    import spark.implicits._
    def ev(txid: Long, conv: String, score: Any) = {
      val base = Seq((txid, "update", s"e$txid", conv, 0))
        .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx")
      score match {
        case i: Int => base.withColumn("score", lit(i))
        case d: Double => base.withColumn("score", lit(d))
        case s: String => base.withColumn("score", lit(s))
      }
    }
    val table = new LakeTable(tmpDir("promote"), numBuckets = 4)
    CdcApply.applyBatch(spark, table, ev(1, "convA", 5))
    assert(table.currentCommit().get.schema("score").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // int + double → double (typeThatWins: real beats integer)
    CdcApply.applyBatch(spark, table, ev(2, "convB", 2.5))
    assert(table.currentCommit().get.schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
    // + string → varchar absorbs everything
    CdcApply.applyBatch(spark, table, ev(3, "convC", "high"))
    assert(table.currentCommit().get.schema("score").dataType ==
      org.apache.spark.sql.types.StringType)
    val rows = table.read(spark).select("conv_id", "score")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // convA may render "5" or "5.0" depending on whether its bucket was
    // physically rewritten while the column was at the double stage —
    // both are the same value under the promotion lattice
    assert(rows("convA").toDouble == 5.0)
    assert(rows("convB") == "2.5" && rows("convC") == "high")
    assert(rows.size == 3)
  }

  test("out-of-order segments: applying newer txid ranges FIRST still converges") {
    val events = corpus(2000)
    val table = new LakeTable(tmpDir("ooo"), numBuckets = 16)
    // segments arrive 3,1,2 — per-key version gate must sort it out
    CdcApply.applyBatch(spark, table, events.where(col("_txid") > 1400))
    CdcApply.applyBatch(spark, table, events.where(col("_txid") <= 700))
    CdcApply.applyBatch(spark, table,
      events.where(col("_txid") > 700 && col("_txid") <= 1400))
    assertSameRows(finalPayload(table), Corpus.oracleFinalState(events))
  }

  test("stale update after newer delete cannot resurrect the key (tombstone)") {
    import spark.implicits._
    def ev(txid: Long, op: String, text: String) =
      Seq((txid, op, s"e$txid", "convX", 1,
        if (op == "delete") null else "user",
        if (op == "delete") null else text,
        null: String,
        if (op == "delete") null else java.sql.Timestamp.valueOf("2014-03-11 00:00:01")))
        .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val table = new LakeTable(tmpDir("tomb"), numBuckets = 4)
    CdcApply.applyBatch(spark, table, ev(10, "update", "v10"))
    CdcApply.applyBatch(spark, table, ev(20, "delete", ""))
    // stale update (txid 15 < delete txid 20) arrives late
    val s = CdcApply.applyBatch(spark, table, ev(15, "update", "v15-stale"))
    assert(s.applied == 0)
    assert(finalPayload(table).count() == 0)
    // but a GENUINELY newer update revives it
    CdcApply.applyBatch(spark, table, ev(30, "update", "v30"))
    val rows = finalPayload(table).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("text") == "v30")
  }

  test("delta, broadcast-rewrite and full-outer paths produce identical final state") {
    val events = corpus(2000)
    val segs = Seq(
      events.where(col("_txid") <= 700),
      events.where(col("_txid") > 700 && col("_txid") <= 1400),
      events.where(col("_txid") > 1400))
    val tA = new LakeTable(tmpDir("path-delta"), numBuckets = 16)
    val tB = new LakeTable(tmpDir("path-fullouter"), numBuckets = 16)
    val tC = new LakeTable(tmpDir("path-bcast-rw"), numBuckets = 16)
    segs.foreach { s =>
      CdcApply.applyBatch(spark, tA, s) // default: base then MoR deltas
      CdcApply.applyBatch(spark, tB, s, broadcastThreshold = 0L) // full-outer
      CdcApply.applyBatch(spark, tC, s, maxDeltaDepth = 0) // broadcast rewrite
    }
    assert(tA.currentCommit().get.metrics("deltaCommit") == 1L)
    assert(tA.currentCommit().get.deltaFiles.nonEmpty)
    assert(tB.currentCommit().get.metrics("broadcastMerge") == 0L)
    assert(tC.currentCommit().get.metrics("broadcastMerge") == 1L)
    assert(tC.currentCommit().get.deltaFiles.isEmpty)
    assertSameRows(finalPayload(tA), finalPayload(tB))
    assertSameRows(finalPayload(tC), finalPayload(tB))
    assertSameRows(finalPayload(tA), Corpus.oracleFinalState(events))
  }

  test("delta depth is bounded: the apply folds deltas into a fresh base at the cap") {
    val events = corpus(6000)
    val table = new LakeTable(tmpDir("depth"), numBuckets = 4)
    val step = 500L
    (0 until 12).foreach { i =>
      CdcApply.applyBatch(spark, table,
        events.where(col("_txid") > i * step && col("_txid") <= (i + 1) * step),
        maxDeltaDepth = 3)
    }
    val depths = table.commitLog().map(_.deltaDepth)
    assert(depths.max <= 3, s"depth exceeded cap: $depths")
    // at least one fold happened (depth reset after hitting the cap)
    assert(table.commitLog().count(_.metrics.getOrElse("deltaCommit", 0L) == 0L) >= 2)
    assertSameRows(finalPayload(table), Corpus.oracleFinalState(events))
  }

  test("per-bucket fold: only buckets at the depth cap are rewritten") {
    import spark.implicits._
    val events = corpus(2000)
    val table = new LakeTable(tmpDir("perbucket"), numBuckets = 16)
    CdcApply.applyBatch(spark, table, events) // base commit
    val basePaths = table.currentCommit().get.buckets
    def patch(txid: Long, conv: String) =
      Seq((txid, "update", s"e$txid", conv, 0, "user", s"p$txid",
        null: String, java.sql.Timestamp.valueOf("2014-03-12 00:00:00")))
        .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val hot = "conv00000001"
    val hotBucket = spark.range(1).select(table.bucketCol(lit(hot))).head.getInt(0)
    // two delta commits stack the hot bucket to the cap...
    CdcApply.applyBatch(spark, table, patch(100001, hot), maxDeltaDepth = 2)
    CdcApply.applyBatch(spark, table, patch(100002, hot), maxDeltaDepth = 2)
    assert(table.currentCommit().get.deltaDepthOf(hotBucket) == 2)
    // ...the third FOLDS (foldRatio=0 forces fold over consolidation) —
    // and must rewrite ONLY the hot bucket
    CdcApply.applyBatch(spark, table, patch(100003, hot), maxDeltaDepth = 2,
      foldRatio = 0.0)
    val folded = table.currentCommit().get
    assert(folded.metrics("foldedBuckets") == 1L)
    assert(folded.deltaDepthOf(hotBucket) == 0)
    assert(folded.buckets(hotBucket.toString) != basePaths(hotBucket.toString))
    val untouched = basePaths.keySet - hotBucket.toString
    assert(untouched.forall(b => folded.buckets(b) == basePaths(b)),
      "fold rewrote buckets that were not at the cap")
    assert(table.read(spark).where($"conv_id" === hot && $"turn_idx" === 0)
      .head.getAs[String]("text") == "p100003")
  }

  test("mixed batch: capped bucket folds while a cold bucket deltas, in ONE commit") {
    import spark.implicits._
    val events = corpus(2000)
    val table = new LakeTable(tmpDir("mixed"), numBuckets = 16)
    CdcApply.applyBatch(spark, table, events)
    val hot = "conv00000001"
    val hotBucket = spark.range(1).select(table.bucketCol(lit(hot))).head.getInt(0)
    // pick a cold conv that hashes to a DIFFERENT bucket
    val cold = (2 to 40).map(i => f"conv$i%08d").find { c =>
      spark.range(1).select(table.bucketCol(lit(c))).head.getInt(0) != hotBucket
    }.get
    def patch(txid: Long, conv: String) =
      Seq((txid, "update", s"e$txid", conv, 0, "user", s"p$txid",
        null: String, java.sql.Timestamp.valueOf("2014-03-12 00:00:00")))
        .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    CdcApply.applyBatch(spark, table, patch(100001, hot), maxDeltaDepth = 2)
    CdcApply.applyBatch(spark, table, patch(100002, hot), maxDeltaDepth = 2)
    val before = table.commitLog().size
    // hot is at the cap, cold is not — one batch touching both
    CdcApply.applyBatch(spark, table,
      patch(100003, hot).unionByName(patch(100004, cold)), maxDeltaDepth = 2,
      foldRatio = 0.0)
    val c = table.currentCommit().get
    assert(table.commitLog().size == before + 1, "mixed apply must be ONE commit")
    assert(c.metrics("foldedBuckets") == 1L && c.metrics("deltaRows") == 1L)
    assert(c.deltaDepthOf(hotBucket) == 0)
    val coldBucket = spark.range(1).select(table.bucketCol(lit(cold))).head.getInt(0)
    assert(c.deltaDepthOf(coldBucket) >= 1)
    val got = table.read(spark).where($"turn_idx" === 0 &&
        $"conv_id".isin(hot, cold))
      .select("conv_id", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got(hot) == "p100003" && got(cold) == "p100004")
  }

  test("at-cap stack CONSOLIDATES into one delta dir; the base is not rewritten") {
    import spark.implicits._
    val events = corpus(2000)
    val table = new LakeTable(tmpDir("consolidate"), numBuckets = 4)
    CdcApply.applyBatch(spark, table, events) // base commit (~125 keys/bucket)
    val basePaths = table.currentCommit().get.buckets
    def patch(txid: Long, conv: String) =
      Seq((txid, "update", s"e$txid", conv, 0, "user", s"p$txid",
        null: String, java.sql.Timestamp.valueOf("2014-03-12 00:00:00")))
        .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val hot = "conv00000001"
    val hotBucket = spark.range(1).select(table.bucketCol(lit(hot))).head.getInt(0)
    CdcApply.applyBatch(spark, table, patch(100001, hot), maxDeltaDepth = 2)
    CdcApply.applyBatch(spark, table, patch(100002, hot), maxDeltaDepth = 2)
    val stacked = table.currentCommit().get
    assert(stacked.deltaDepthOf(hotBucket) == 2)
    // third patch: the stack is at the cap but holds 2 rows vs ~125 base
    // rows — the default policy must CONSOLIDATE, not fold
    CdcApply.applyBatch(spark, table, patch(100003, hot), maxDeltaDepth = 2)
    val c = table.currentCommit().get
    assert(c.metrics("consolidatedBuckets") == 1L && c.metrics("foldedBuckets") == 0L)
    assert(c.deltaDepthOf(hotBucket) == 1, "stack must collapse to ONE dir")
    assert(c.buckets == basePaths, "consolidation must not touch any base")
    // same-key updates collapse: the consolidated dir holds ONE row
    assert(c.deltaRowsOf(hotBucket).contains(1L))
    assert(table.read(spark).where($"conv_id" === hot && $"turn_idx" === 0)
      .head.getAs[String]("text") == "p100003")
    // the cycle repeats: one more append brings the consolidated dir
    // back to the cap, and the next patch consolidates again
    CdcApply.applyBatch(spark, table, patch(100004, hot), maxDeltaDepth = 2)
    assert(table.currentCommit().get.deltaDepthOf(hotBucket) == 2)
    CdcApply.applyBatch(spark, table, patch(100005, hot), maxDeltaDepth = 2)
    val c2 = table.currentCommit().get
    assert(c2.metrics("consolidatedBuckets") == 1L)
    assert(c2.deltaDepthOf(hotBucket) == 1 && c2.buckets == basePaths)
    assert(table.read(spark).where($"conv_id" === hot && $"turn_idx" === 0)
      .head.getAs[String]("text") == "p100005")
  }

  test("consolidated stack folds to a fresh base once delta rows reach the ratio") {
    import spark.implicits._
    val events = corpus(2000)
    val table = new LakeTable(tmpDir("cons-fold"), numBuckets = 4)
    CdcApply.applyBatch(spark, table, events)
    val basePaths = table.currentCommit().get.buckets
    val hot = "conv00000001"
    val hotBucket = spark.range(1).select(table.bucketCol(lit(hot))).head.getInt(0)
    val baseRows = table.currentCommit().get.baseRowsOf(hotBucket).get
    // each batch INSERTS 20 new keys into the hot conv, so the
    // consolidated delta grows by 20/cycle instead of collapsing
    def inserts(batch: Int) = {
      val rows = (0 until 20).map { i =>
        val k = batch * 20 + i
        (200000L + k, "update", s"n$k", hot, 1000 + k, "user", s"ins$k",
          null: String, java.sql.Timestamp.valueOf("2014-03-12 00:00:00"))
      }
      rows.toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    }
    var folded = false
    var consolidatedFirst = false
    var i = 0
    while (!folded && i < 30) {
      CdcApply.applyBatch(spark, table, inserts(i), maxDeltaDepth = 2)
      val c = table.currentCommit().get
      if (!folded && c.metrics.getOrElse("consolidatedBuckets", 0L) > 0L)
        consolidatedFirst = true
      folded = c.metrics.getOrElse("foldedBuckets", 0L) > 0L
      i += 1
    }
    assert(consolidatedFirst, "small stacks must consolidate before any fold")
    assert(folded, s"stack grew past ratio*base=${baseRows / 2} without folding")
    val c = table.currentCommit().get
    assert(c.deltaDepthOf(hotBucket) == 0)
    assert(c.buckets(hotBucket.toString) != basePaths(hotBucket.toString))
    // every inserted key is present exactly once with its latest text
    val got = table.read(spark).where($"conv_id" === hot && $"turn_idx" >= 1000)
    assert(got.count() == i * 20L)
  }

  test("ignore list: novel junk field does not widen the table schema") {
    val events = corpus(800)
    val junked = events.withColumn("junk_debug_field", lit("noise"))
    val table = new LakeTable(tmpDir("ignore"), numBuckets = 8)
    CdcApply.applyBatch(spark, table, junked,
      ignoreFields = Set("junk_debug_field"))
    val fields = table.currentCommit().get.schema.fieldNames.toSet
    assert(!fields.contains("junk_debug_field"), s"schema polluted: $fields")
    // without the ignore list the same field IS absorbed (P3 default)
    val t2 = new LakeTable(tmpDir("absorb"), numBuckets = 8)
    CdcApply.applyBatch(spark, t2, junked)
    assert(t2.currentCommit().get.schema.fieldNames.contains("junk_debug_field"))
  }

  test("batchId idempotence is scoped by queryId (new checkpoint restarts at 0 safely)") {
    val events = corpus(600)
    val table = new LakeTable(tmpDir("qid"), numBuckets = 8)
    val a = events.where(col("_txid") <= 300)
    val b = events.where(col("_txid") > 300)
    CdcApply.applyBatch(spark, table, a, batchId = 0, queryId = "streamA")
    // same stream replays batch 0 → skipped
    assert(CdcApply.applyBatch(spark, table, a, batchId = 0,
      queryId = "streamA").skippedReplay)
    // a DIFFERENT stream's batch 0 must NOT be skipped
    val s = CdcApply.applyBatch(spark, table, b, batchId = 0, queryId = "streamB")
    assert(!s.skippedReplay && s.applied > 0)
    assertSameRows(finalPayload(table), Corpus.oracleFinalState(events))
  }

  test("bucket pruning: second batch touching one conv rewrites few buckets") {
    val events = corpus(2000)
    val table = new LakeTable(tmpDir("prune"), numBuckets = 16)
    CdcApply.applyBatch(spark, table, events)
    import spark.implicits._
    val one = Seq((999999L, "update", "ee", "conv00000001", 0, "user", "patch",
      null: String, java.sql.Timestamp.valueOf("2014-03-12 00:00:00")))
      .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val s = CdcApply.applyBatch(spark, table, one)
    assert(s.bucketsTouched == 1)
    assert(finalPayload(table).where($"text" === "patch").count() == 1)
  }

  test("reopening with a mismatched constructor bucket count still merges correctly") {
    val events = corpus(2000)
    val dir = tmpDir("layout")
    CdcApply.applyBatch(spark, new LakeTable(dir, numBuckets = 8),
      events.where(col("_txid") <= 1000))
    // a differently-configured writer opens the SAME table: the
    // persisted layout count must win or updates would hash to buckets
    // their stored rows are not in (split-key corruption)
    val reopened = new LakeTable(dir, numBuckets = 32)
    assert(reopened.effectiveNumBuckets == 8)
    CdcApply.applyBatch(spark, reopened, events.where(col("_txid") > 1000))
    assertSameRows(finalPayload(reopened), Corpus.oracleFinalState(events))
    // layout stayed 8-bucket on disk and in the new commit's metadata
    assert(reopened.currentCommit().get.metrics(LakeTable.NumBucketsKey) == 8L)
    assert(reopened.currentCommit().get.buckets.keySet.forall(_.toInt < 8))
  }

  test("pre-metric table: a provably wrong constructor count is refused") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("legacy-layout")
    CdcApply.applyBatch(spark, new LakeTable(dir, numBuckets = 8), corpus(500))
    // simulate a pre-upgrade log: strip the persisted layout key
    val s = Files.list(Paths.get(dir, "_commits"))
    try s.iterator().asScala.filter(_.toString.endsWith(".json")).foreach { p =>
      val stripped = Files.readString(p)
        .replaceAll("\"numBuckets\":\\d+,", "")
        .replaceAll(",?\"numBuckets\":\\d+", "")
      Files.writeString(p, stripped)
    } finally s.close()
    // bucket ids up to 7 exist — claiming a 4-bucket layout is provably
    // wrong and must refuse instead of splitting keys across hash spaces
    intercept[IllegalArgumentException](
      new LakeTable(dir, numBuckets = 4).effectiveNumBuckets)
    // the honest count still works (legacy trust path)
    assert(new LakeTable(dir, numBuckets = 8).effectiveNumBuckets == 8)
  }

  test("rebucket re-hashes the layout atomically; appliers follow the new count") {
    val events = corpus(2000)
    val dir = tmpDir("rebucket")
    val t = new LakeTable(dir, numBuckets = 4)
    CdcApply.applyBatch(spark, t, events.where(col("_txid") <= 1500))
    val vBefore = t.currentCommit().get.version
    val c = t.rebucket(spark, 16)
    assert(t.effectiveNumBuckets == 16)
    assert(c.buckets.keySet.exists(_.toInt >= 4), "no rows landed above the old hash space?")
    assert(c.deltas.isEmpty, "rebucket must clear every delta stack into the new base")
    // a physical-only rewrite: the changelog across it is empty
    assert(t.changesBetween(spark, vBefore, c.version).count() == 0)
    // a stale-configured handle keeps merging correctly in the NEW space
    val stale = new LakeTable(dir, numBuckets = 4)
    assert(stale.effectiveNumBuckets == 16)
    CdcApply.applyBatch(spark, stale, events.where(col("_txid") > 1500))
    assertSameRows(finalPayload(stale), Corpus.oracleFinalState(events))
    assert(stale.currentCommit().get.metrics(LakeTable.NumBucketsKey) == 16L)
  }
}
