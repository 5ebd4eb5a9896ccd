package graft

import org.apache.spark.sql.functions._

import graft.cdc.CdcApply
import graft.model.Corpus
import graft.table.LakeTable

/** Declared column renames (LakeTable.renameColumn) — the north rule's
  * "renamed transcript fields like tool" arm of schema evolution:
  * metadata-only commits, reader-side mapping of pre-rename data dirs,
  * and apply-side folding of late producers that still emit the
  * retired key. */
class RenameSpec extends SparkSpec {

  private def dataDirs(dir: String): Set[String] = {
    val data = java.nio.file.Paths.get(dir, "data")
    if (!java.nio.file.Files.exists(data)) Set.empty
    else {
      val s = java.nio.file.Files.list(data)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSet
      } finally s.close()
    }
  }

  test("rename is a metadata-only commit and readers map old dirs") {
    val dir = tmpDir("ren-meta")
    val table = new LakeTable(dir, numBuckets = 8)
    val events = Corpus.changeEvents(spark, 800, nConvs = 30, maxTurns = 8)
    CdcApply.applyBatch(spark, table, events)
    val dirsBefore = dataDirs(dir)
    val vBefore = table.currentCommit().get.version

    val c = table.renameColumn("tool", "tool_name")
    assert(c.version == vBefore + 1)
    assert(dataDirs(dir) == dirsBefore) // no data file written or removed
    assert(c.renames == Map("tool" -> "tool_name"))
    assert(c.schema.fieldNames.contains("tool_name"))
    assert(!c.schema.fieldNames.contains("tool"))

    // every pre-rename value surfaces under the new name
    assertSameRows(
      table.read(spark).select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool_name").as("tool"), col("ts")),
      Corpus.oracleFinalState(events))
  }

  test("late producers emitting the retired key fold into the current column") {
    val table = new LakeTable(tmpDir("ren-late"), numBuckets = 8)
    val events = Corpus.changeEvents(spark, 1200, nConvs = 40, maxTurns = 8)
    val (b1, b2) = (events.where(col("_txid") <= 600),
      events.where(col("_txid") > 600))
    CdcApply.applyBatch(spark, table, b1)
    table.renameColumn("tool", "tool_name")
    // b2 still carries the OLD column name (a producer that has not
    // migrated) — applyBatch must fold it into tool_name, not absorb
    // "tool" as a novel field
    CdcApply.applyBatch(spark, table, b2)
    val schema = table.currentCommit().get.schema
    assert(schema.fieldNames.contains("tool_name"))
    assert(!schema.fieldNames.contains("tool"))
    assertSameRows(
      table.read(spark).select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool_name").as("tool"), col("ts")),
      Corpus.oracleFinalState(events))
  }

  test("mid-migration batch carrying both names prefers the current one") {
    val table = new LakeTable(tmpDir("ren-both"), numBuckets = 4)
    val events = Corpus.changeEvents(spark, 300, nConvs = 10, maxTurns = 5)
    CdcApply.applyBatch(spark, table, events.where(col("_txid") <= 150))
    table.renameColumn("tool", "tool_name")
    val mixed = events.where(col("_txid") > 150)
      .withColumn("tool_name",
        when(col("_txid") % 2 === 0, col("tool")).otherwise(lit(null)))
    CdcApply.applyBatch(spark, table, mixed)
    // rows where tool_name was null fell back to the retired column, so
    // the final state is exactly the oracle's
    assertSameRows(
      table.read(spark).select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool_name").as("tool"), col("ts")),
      Corpus.oracleFinalState(events))
  }

  test("chained renames stay flattened and resolve any vintage in one hop") {
    val table = new LakeTable(tmpDir("ren-chain"), numBuckets = 4)
    val events = Corpus.changeEvents(spark, 600, nConvs = 20, maxTurns = 6)
    val third = 200L
    CdcApply.applyBatch(spark, table, events.where(col("_txid") <= third))
    table.renameColumn("tool", "tool_name")
    CdcApply.applyBatch(spark, table,
      events.where(col("_txid") > third && col("_txid") <= 2 * third)
        .withColumnRenamed("tool", "tool_name"))
    table.renameColumn("tool_name", "tool_fqn")
    CdcApply.applyBatch(spark, table,
      events.where(col("_txid") > 2 * third)
        .withColumnRenamed("tool", "tool_fqn"))
    val c = table.currentCommit().get
    assert(c.renames == Map("tool" -> "tool_fqn", "tool_name" -> "tool_fqn"))
    assertSameRows(
      table.read(spark).select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool_fqn").as("tool"), col("ts")),
      Corpus.oracleFinalState(events))
  }

  test("structural and invalid renames refuse") {
    val table = new LakeTable(tmpDir("ren-refuse"), numBuckets = 4)
    CdcApply.applyBatch(spark, table,
      Corpus.changeEvents(spark, 100, nConvs = 5, maxTurns = 4))
    intercept[IllegalArgumentException](table.renameColumn("conv_id", "cid"))
    intercept[IllegalArgumentException](table.renameColumn("_txid", "txid"))
    intercept[IllegalArgumentException](table.renameColumn("nope", "x"))
    intercept[IllegalArgumentException](table.renameColumn("tool", "text"))
    intercept[IllegalArgumentException](table.renameColumn("tool", "tool"))
    intercept[IllegalArgumentException](
      new LakeTable(tmpDir("ren-empty"), numBuckets = 4)
        .renameColumn("tool", "tool_name"))
  }

  test("streaming tail absorbs a mid-stream rename from an unmigrated producer") {
    import graft.streaming.CdcStream
    // evolveFrac=0 so the `tool` field exists from the first segment
    // (the default corpus introduces it only after 60% of the stream)
    val events = Corpus.changeEvents(spark, 1000, nConvs = 25, maxTurns = 6,
      evolveFrac = 0.0)
    val logDir = tmpDir("ren-stream-log")
    CdcStream.writeSegment(
      Corpus.shuffled(events.where(col("_txid") <= 500)), s"$logDir/seg0")
    val table = new LakeTable(tmpDir("ren-stream-table"), numBuckets = 8)
    CdcStream.runOnce(spark, s"$logDir/seg*", table, tmpDir("ren-stream-ck1"))
    table.renameColumn("tool", "tool_name")
    // the producer has NOT migrated: the next WAL segments still carry
    // the retired key. Drift detection sees "tool" as novel vs the
    // evolved cached schema, re-infers so the value is parsed at all,
    // and the apply folds it into tool_name without re-adding "tool"
    CdcStream.writeSegment(
      Corpus.shuffled(events.where(col("_txid") > 500)), s"$logDir/seg1")
    CdcStream.runOnce(spark, s"$logDir/seg*", table, tmpDir("ren-stream-ck2"),
      maxFilesPerTrigger = 1)
    val schema = table.currentCommit().get.schema
    assert(schema.fieldNames.contains("tool_name"))
    assert(!schema.fieldNames.contains("tool"))
    assertSameRows(
      table.read(spark).select(col("conv_id"), col("turn_idx"), col("role"),
        col("text"), col("tool_name").as("tool"), col("ts")),
      Corpus.oracleFinalState(events))
  }

  test("a rename racing a data commit is a true conflict; the redo converges") {
    val table = new LakeTable(tmpDir("ren-race"), numBuckets = 8)
    val events = Corpus.changeEvents(spark, 600, nConvs = 20, maxTurns = 6,
      evolveFrac = 0.0)
    CdcApply.applyBatch(spark, table, events.where(col("_txid") <= 300))
    // a second handle on the same table lands a RENAME inside the data
    // commit's publish window (after it read the log, before link(2)):
    // the data commit's schema and files were derived pre-rename, so
    // the optimistic retry must REFUSE instead of silently re-publishing
    // the retired name over the rename
    val admin = new LakeTable(table.location, numBuckets = 8)
    table.testBeforePublish = () => { admin.renameColumn("tool", "tool_name"); () }
    intercept[java.util.ConcurrentModificationException](
      CdcApply.applyBatch(spark, table, events.where(col("_txid") > 300)))
    // the redo against the renamed snapshot folds the batch onto the
    // current names and the final state matches the oracle
    CdcApply.applyBatch(spark, table, events.where(col("_txid") > 300))
    val schema = table.currentCommit().get.schema
    assert(schema.fieldNames.contains("tool_name") &&
      !schema.fieldNames.contains("tool"))
    assertSameRows(
      table.read(spark).select(col("conv_id"), col("turn_idx"), col("role"),
        col("text"), col("tool_name").as("tool"), col("ts")),
      Corpus.oracleFinalState(events))
  }

  test("rename survives fold, compaction and the checkpoint rollup") {
    val dir = tmpDir("ren-maint")
    val table = new LakeTable(dir, numBuckets = 4)
    val events = Corpus.changeEvents(spark, 1000, nConvs = 12, maxTurns = 6)
    CdcApply.applyBatch(spark, table, events.where(col("_txid") <= 500))
    table.renameColumn("tool", "tool_name")
    // enough churn on few buckets to drive delta stacking + maintenance
    CdcApply.replay(spark, table,
      events.where(col("_txid") > 500).withColumnRenamed("tool", "tool_name"),
      nBatches = 4)
    table.compact(spark, tombstoneHorizon = 0L)
    table.checkpointLog()
    table.vacuum()
    val c = table.currentCommit().get
    assert(c.renames == Map("tool" -> "tool_name"))
    assertSameRows(
      table.read(spark).select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool_name").as("tool"), col("ts")),
      Corpus.oracleFinalState(events))
  }
}
