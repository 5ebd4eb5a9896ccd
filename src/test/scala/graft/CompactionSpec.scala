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
}
