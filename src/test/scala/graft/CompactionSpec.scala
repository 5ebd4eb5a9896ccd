package graft

import org.apache.spark.sql.functions._

import graft.cdc.CdcApply
import graft.model.Corpus
import graft.table.LakeTable

class CompactionSpec extends SparkSpec {

  test("vacuum deletes unreferenced snapshot dirs, keeps the retention window readable") {
    import org.apache.spark.sql.functions._
    val events = Corpus.changeEvents(spark, 4000, nConvs = 40, maxTurns = 8)
    val table = new LakeTable(tmpDir("vacuum"), numBuckets = 8)
    // several full rewrites strand predecessor dirs
    (0 until 4).foreach { i =>
      CdcApply.applyBatch(spark, table,
        events.where(col("_txid") > i * 1000L && col("_txid") <= (i + 1) * 1000L),
        pruneBuckets = false)
    }
    val dataDir = java.nio.file.Paths.get(table.location, "data")
    def dirs = {
      val s = java.nio.file.Files.list(dataDir)
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSet }
      finally s.close()
    }
    val before = dirs
    val expected = finalPayloadRows(table)
    val deleted = table.vacuum(retainCommits = 1)
    assert(deleted.nonEmpty, s"nothing vacuumed from $before")
    assert(dirs == before -- deleted)
    // the latest snapshot still reads bit-identically
    assert(finalPayloadRows(table) == expected)
    // every surviving dir is referenced by the latest commit
    val c = table.currentCommit().get
    val referenced = (c.buckets.values ++ c.deltas.values.flatten)
      .map(_.split("/")(1)).toSet
    assert(dirs.forall(referenced.contains), s"unreferenced dirs survive: ${dirs -- referenced}")
  }

  private def finalPayloadRows(t: LakeTable): Set[String] =
    t.read(spark).select("conv_id", "turn_idx", "text")
      .collect().map(_.mkString("|")).toSet

  test("vacuum reclaims delta dirs stranded by a stack consolidation") {
    import spark.implicits._
    val events = Corpus.changeEvents(spark, 2000, nConvs = 40, maxTurns = 8)
    val table = new LakeTable(tmpDir("vacuum-cons"), numBuckets = 4)
    CdcApply.applyBatch(spark, table, events)
    def patch(txid: Long) =
      Seq((txid, "update", s"e$txid", "conv00000001", 0, "user", s"p$txid",
        null: String, java.sql.Timestamp.valueOf("2014-03-12 00:00:00")))
        .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    CdcApply.applyBatch(spark, table, patch(100001), maxDeltaDepth = 2)
    CdcApply.applyBatch(spark, table, patch(100002), maxDeltaDepth = 2)
    val stackDirs = table.currentCommit().get.deltaFiles.map(_.split("/")(1)).toSet
    assert(stackDirs.size == 2)
    // consolidation replaces the whole stack (this conv's bucket is the
    // only bucket in these delta dirs), stranding both old dirs
    CdcApply.applyBatch(spark, table, patch(100003), maxDeltaDepth = 2)
    assert(table.currentCommit().get.metrics("consolidatedBuckets") == 1L)
    val expected = finalPayloadRows(table)
    val deleted = table.vacuum(retainCommits = 1)
    assert(stackDirs.subsetOf(deleted.toSet),
      s"stranded stack dirs $stackDirs not vacuumed (deleted: $deleted)")
    assert(finalPayloadRows(table) == expected)
    assert(table.read(spark)
      .where($"conv_id" === "conv00000001" && $"turn_idx" === 0)
      .head.getAs[String]("text") == "p100003")
  }

  test("pre-upgrade un-bucketed delta commits are refused, not silently dropped") {
    val events = Corpus.changeEvents(spark, 500, nConvs = 20, maxTurns = 4)
    val table = new LakeTable(tmpDir("legacy"), numBuckets = 4)
    CdcApply.applyBatch(spark, table, events)
    // forge a legacy-format commit carrying an un-bucketed delta dir
    val c = table.currentCommit().get
    val legacy = ("""{"version":%d,"batchId":-1,"txidWatermark":%d,""" +
      """"schemaJson":%s,"buckets":{},"rowCounts":{},"metrics":{},""" +
      """"queryId":"","deltaFiles":["data/c000000000001d"]}""").format(
      c.version + 1, c.txidWatermark,
      org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(org.json4s.JString(c.schemaJson))))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(table.location, "_commits",
        f"${c.version + 1}%012d.json"), legacy)
    val fresh = new LakeTable(table.location, numBuckets = 4)
    val ex = intercept[UnsupportedOperationException] { fresh.currentCommit() }
    assert(ex.getMessage.contains("deltaFiles"))
  }

  test("commit-log checkpoint truncates history, keeps idempotence and promoted schemas") {
    import spark.implicits._
    val events = Corpus.changeEvents(spark, 3000, nConvs = 40, maxTurns = 8)
    val table = new LakeTable(tmpDir("logckpt"), numBuckets = 8)
    (0 until 6).foreach { i =>
      CdcApply.applyBatch(spark, table,
        events.where(col("_txid") > i * 500L && col("_txid") <= (i + 1) * 500L),
        batchId = i, queryId = "s1")
    }
    // a payload column that PROMOTES across commits: its early dirs were
    // written under the narrow schema, so post-checkpoint reads must
    // still find the writer schemas for reader-side promotion
    def scored(txid: Long, conv: String, score: Any) = {
      val base = Seq((txid, "update", s"e$txid", conv, 0))
        .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx")
      score match {
        case i: Int => base.withColumn("score", lit(i))
        case s: String => base.withColumn("score", lit(s))
      }
    }
    CdcApply.applyBatch(spark, table, scored(9001, "convP", 5), batchId = 6, queryId = "s1")
    val expected = finalPayloadRows(table)
    val filesBefore = table.commitLogSize
    table.checkpointLog()
    assert(table.commitLogSize == 1, s"log not truncated (was $filesBefore)")
    // idempotence across the truncation: every pre-checkpoint batch id
    // of the same stream is still detected; other streams are not
    (0 to 6).foreach(b => assert(table.hasBatch(b, "s1"), s"batch $b forgotten"))
    assert(!table.hasBatch(0, "s2"))
    assert(finalPayloadRows(table) == expected)
    // promote score int -> string AFTER the checkpoint; the old dir's
    // writer schema must come from the rollup for the cast-up read
    CdcApply.applyBatch(spark, table, scored(9002, "convQ", "high"), batchId = 7, queryId = "s1")
    val scores = table.read(spark).where($"conv_id".isin("convP", "convQ"))
      .select("conv_id", "score").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(scores("convP") == "5" && scores("convQ") == "high")
    assert(table.hasBatch(7, "s1") && table.hasBatch(3, "s1"))
    // new commits append after the rollup; a second checkpoint subsumes them
    table.checkpointLog()
    assert(table.commitLogSize == 1)
    assert(finalPayloadRows(table) == expected + "convQ|0|null")
  }

  test("compaction drops aged tombstones, preserves live rows and semantics") {
    val events = Corpus.changeEvents(spark, 2000, nConvs = 40, maxTurns = 8)
    val table = new LakeTable(tmpDir("compact"), numBuckets = 8)
    CdcApply.replay(spark, table, events, nBatches = 2)
    val before = table.read(spark)
    val liveBefore = before.count()
    val rawBefore = table.readRaw(spark).count()
    assert(rawBefore > liveBefore, "corpus should have produced tombstones")

    // compact with horizon = watermark + 1 → every tombstone is aged out
    table.compact(spark, tombstoneHorizon = table.txidWatermark + 1)
    val liveAfter = table.read(spark).count()
    val rawAfter = table.readRaw(spark).count()
    assert(liveAfter == liveBefore, "compaction must not change live rows")
    assert(rawAfter == liveAfter, "all tombstones should be gone")
    assertSameRows(
      table.read(spark).select("conv_id", "turn_idx", "role", "text", "tool", "ts"),
      Corpus.oracleFinalState(events))
  }

  test("a kept tombstone still blocks stale resurrection after compaction") {
    import spark.implicits._
    def ev(txid: Long, op: String) =
      Seq((txid, op, s"e$txid", "convZ", 1,
        if (op == "delete") null else "user",
        if (op == "delete") null else s"v$txid", null: String,
        if (op == "delete") null else java.sql.Timestamp.valueOf("2014-03-11 00:00:01")))
        .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val table = new LakeTable(tmpDir("compact2"), numBuckets = 4)
    CdcApply.applyBatch(spark, table, ev(10, "update"))
    CdcApply.applyBatch(spark, table, ev(20, "delete"))
    // horizon below the tombstone txid → tombstone survives compaction
    table.compact(spark, tombstoneHorizon = 15)
    assert(table.readRaw(spark).count() == 1)
    // stale update still rejected
    CdcApply.applyBatch(spark, table, ev(15, "update"))
    assert(table.read(spark).count() == 0)
  }

  test("readers are snapshot-isolated from later commits, folds and vacuum") {
    val events = Corpus.changeEvents(spark, 4000, nConvs = 40, maxTurns = 8)
    val table = new LakeTable(tmpDir("snapiso"), numBuckets = 8)
    CdcApply.applyBatch(spark, table, events.where(col("_txid") <= 2000))
    // a reader plans against commit v1's file list NOW...
    val reader = table.read(spark)
      .select("conv_id", "turn_idx", "text", "_txid")
    val v1State = reader.collect().map(_.mkString("|")).toSet
    // ...then the table moves on: delta commits, a forced fold of every
    // touched bucket (fresh base dirs), and a vacuum that deletes
    // everything outside the retention window — but NOT v1's dirs,
    // which the retained-commit window still references
    CdcApply.applyBatch(spark, table,
      events.where(col("_txid") > 2000 && col("_txid") <= 3000))
    CdcApply.applyBatch(spark, table,
      events.where(col("_txid") > 3000), maxDeltaDepth = 1, foldRatio = 0.0)
    table.vacuum(retainCommits = 3)
    assert(table.currentCommit().get.version >= 3)
    // the old plan still reads exactly v1's rows — snapshot isolation
    // holds because data dirs are immutable (each commit writes NEW
    // dirs; only vacuum outside the retention window deletes)
    assert(reader.collect().map(_.mkString("|")).toSet == v1State,
      "reader plan bound to v1 saw later writes or lost files")
    // while a fresh reader sees the latest state
    assert(table.read(spark).agg(max(col("_txid"))).head().getLong(0) > 3000)
  }
}
