package graft

import org.apache.spark.sql.functions._

import graft.cdc.CdcApply
import graft.model.Corpus
import graft.table.LakeTable

/** Snapshot time travel (LakeTable.readVersion / versionAt): pinning a
  * reproducible past snapshot under a live streaming tail, bounded by
  * the checkpointLog/vacuum retention window. */
class TimeTravelSpec extends SparkSpec {

  test("readVersion reproduces each commit's state after later commits") {
    val table = new LakeTable(tmpDir("tt-basic"), numBuckets = 8)
    val events = Corpus.changeEvents(spark, 900, nConvs = 25, maxTurns = 6)
    CdcApply.applyBatch(spark, table, events.where(col("_txid") <= 300))
    val v1 = table.currentCommit().get.version
    CdcApply.applyBatch(spark, table,
      events.where(col("_txid") > 300 && col("_txid") <= 600))
    val v2 = table.currentCommit().get.version
    CdcApply.applyBatch(spark, table, events.where(col("_txid") > 600))

    def payload(df: org.apache.spark.sql.DataFrame) =
      df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    assertSameRows(payload(table.readVersion(spark, v1)),
      Corpus.oracleFinalState(events.where(col("_txid") <= 300)))
    assertSameRows(payload(table.readVersion(spark, v2)),
      Corpus.oracleFinalState(events.where(col("_txid") <= 600)))
    // the latest version reads identically through both paths
    assertSameRows(
      payload(table.readVersion(spark, table.currentCommit().get.version)),
      payload(table.read(spark)))
  }

  test("versionAt maps a changelog position onto the snapshot that holds it") {
    val table = new LakeTable(tmpDir("tt-txid"), numBuckets = 8)
    val events = Corpus.changeEvents(spark, 600, nConvs = 20, maxTurns = 6)
    CdcApply.applyBatch(spark, table, events.where(col("_txid") <= 200))
    val v1 = table.currentCommit().get.version
    CdcApply.applyBatch(spark, table, events.where(col("_txid") > 200))
    val v2 = table.currentCommit().get.version
    assert(table.versionAt(200L).contains(v1))
    assert(table.versionAt(350L).contains(v1)) // mid-batch: last ≤ position
    assert(table.versionAt(600L).contains(v2))
    assert(table.versionAt(10L).isEmpty) // before the first commit
    // "as of event 200" is exactly the first batch's fold
    assertSameRows(
      table.readVersion(spark, table.versionAt(200L).get)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts"),
      Corpus.oracleFinalState(events.where(col("_txid") <= 200)))
  }

  test("travel outside the retention window refuses explicitly") {
    val table = new LakeTable(tmpDir("tt-retention"), numBuckets = 4)
    val events = Corpus.changeEvents(spark, 800, nConvs = 10, maxTurns = 6)
    CdcApply.applyBatch(spark, table, events.where(col("_txid") <= 400),
      pruneBuckets = false)
    val v1 = table.currentCommit().get.version
    CdcApply.applyBatch(spark, table, events.where(col("_txid") > 400),
      pruneBuckets = false)
    // compaction rewrites every bucket; vacuum then GCs v1's dirs
    table.compact(spark, tombstoneHorizon = Long.MaxValue)
    table.vacuum()
    val e1 = intercept[IllegalArgumentException](table.readVersion(spark, v1))
    assert(e1.getMessage.contains("vacuumed"))
    // rolled-up history refuses by version, not by a missing-file crash
    table.checkpointLog()
    val e2 = intercept[IllegalArgumentException](table.readVersion(spark, v1))
    assert(e2.getMessage.contains("retained commit log"))
    intercept[IllegalArgumentException](table.readVersion(spark, 999L))
  }
}
