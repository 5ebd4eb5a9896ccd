package graft.cdc

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.model.Model
import graft.table.LakeTable

/** Result of applying one change-event batch. */
case class ApplyStats(
    version: Long,
    applied: Long,
    upserts: Long,
    deletes: Long,
    skippedReplay: Boolean,
    txidWatermark: Long,
    bucketsTouched: Int)

/** The MERGE-apply stage: one micro-batch of change events → one new
  * snapshot of the target [[LakeTable]].
  *
  * Pipeline (SURVEY.md §3.4; each step anchored to a reference op):
  *   1. exactly-once guards — batch-id replay check + `_txid >
  *      watermark` filter (reference: _etag snapshot diffing,
  *      /root/reference/manta/pull_update.sh:35-42);
  *   2. within-batch collapse — latest txid wins per (conv_id,
  *      turn_idx) via row_number window (reference: `sort -r | uniq`
  *      idempotent dedupe, /root/reference/manta/dc_inputs_2b.sh:33-35);
  *   3. bucket pruning — only the hash-buckets the incoming keys map to
  *      are read and rewritten (reference analogue: per-split map
  *      tasks, /root/reference/manta/dc_inputs.sh:57-66);
  *   4. merge — left-anti survivors ∪ upserts (MERGE INTO semantics,
  *      delete = key vanishes);
  *   5. salted repartition before the write so one hot conversation
  *      cannot serialize a whole bucket into one task (north-rule skew
  *      mandate — the reference has no skew handling, SURVEY.md §4.1);
  *   6. atomic commit with txid high-watermark + per-bucket lineage
  *      counts.
  *
  * Scale notes: the only full pass over the *batch* is one agg + one
  * window shuffle keyed (conv_id, turn_idx) — fine-grained, so conv-level
  * skew doesn't hit it. The target table is touched only on affected
  * buckets; survivors↔upserts join is keyed on the merge key and AQE
  * may broadcast the small side. Nothing scans unaffected data.
  */
object CdcApply {

  val SaltBuckets = 8

  /** Widen `prev` with any payload columns that appear only in `incoming`
    * (novel-field absorption → schema evolution; reference:
    * /root/reference/lib/moraydump_reorg.js:501-529). */
  def evolveSchema(prev: StructType, incoming: StructType): StructType = {
    val known = prev.fieldNames.toSet
    val novel = incoming.fields.filterNot(f => known.contains(f.name))
    StructType(prev.fields ++ novel.map(_.copy(nullable = true)))
  }

  /** Project `df` onto `schema`: missing columns become typed nulls,
    * present columns are cast to the table's type. */
  private def align(df: DataFrame, schema: StructType): DataFrame = {
    val cols = schema.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** Columns stored in the table: merge keys + payload + CDC metadata. */
  private def storedSchema(payload: StructType): StructType =
    StructType(payload.fields ++ Seq(
      StructField("_txid", LongType), StructField("_etag", StringType)))

  def applyBatch(
      spark: SparkSession,
      table: LakeTable,
      events: DataFrame,
      batchId: Long = -1L,
      saltBuckets: Int = SaltBuckets): ApplyStats = {
    val prev = table.currentCommit()
    if (batchId >= 0 && table.hasBatch(batchId))
      return ApplyStats(prev.map(_.version).getOrElse(0L), 0, 0, 0,
        skippedReplay = true, table.txidWatermark, 0)

    val wm = prev.map(_.txidWatermark).getOrElse(0L)
    // exactly-once: txids at or below the committed watermark were
    // already applied — a replayed/overlapping batch degrades to the
    // unseen suffix. (Requires txid-ordered batch boundaries, which the
    // changelog tail guarantees; arbitrary late txids below the
    // watermark are resolved by the same rule the reference uses for
    // snapshot diffs: already-seen etags are skipped.)
    val fresh = events.where(col("_txid") > wm)

    val firstAgg = fresh.agg(
      count(lit(1)).as("n"), max(col("_txid")).as("maxTx"),
      sum(when(col("_op") === "delete", 1L).otherwise(0L)).as("dels")).head()
    val nFresh = firstAgg.getAs[Long]("n")
    if (nFresh == 0L)
      return ApplyStats(prev.map(_.version).getOrElse(0L), 0, 0, 0,
        skippedReplay = false, wm, 0)
    val maxTx = firstAgg.getAs[Long]("maxTx")

    // schema evolution from the event envelope's payload columns
    val envelope = Set("_txid", "_op", "_etag", "_bucket")
    val payloadIn = StructType(fresh.schema.fields.filterNot(f => envelope(f.name)))
    val prevPayload = prev.map(c => StructType(
      c.schema.fields.filterNot(f => envelope(f.name)))).getOrElse(
      StructType(Seq(
        StructField("conv_id", StringType, nullable = false),
        StructField("turn_idx", IntegerType, nullable = false))))
    val payload = evolveSchema(prevPayload, payloadIn)
    val schema = storedSchema(payload)

    // latest event wins per key within the batch (window §2.8);
    // _etag tiebreak only for determinism under duplicated txids
    val w = Window.partitionBy(Model.MergeKeys.map(col): _*)
      .orderBy(col("_txid").desc, col("_etag").desc_nulls_last)
    val winners = fresh
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .withColumn("_bucket", table.bucketCol(col("conv_id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = winners.select("_bucket").distinct()
        .collect().map(_.getInt(0)).sorted // ≤ numBuckets values — tiny
      val upserts = align(
        winners.where(col("_op") =!= "delete"), schema)
        .withColumn("_bucket", table.bucketCol(col("conv_id")))

      val target = align(
        table.readBuckets(spark, touched.toSeq), schema)
        .withColumn("_bucket", table.bucketCol(col("conv_id")))
      val survivors = target.join(
        winners.select(Model.MergeKeys.map(col): _*),
        Model.MergeKeys, "left_anti")

      val merged = survivors.unionByName(upserts)
        // salt: hot conv_ids spread across tasks inside their bucket
        .repartition(col("_bucket"),
          pmod(xxhash64(col("conv_id"), col("turn_idx")), lit(saltBuckets.toLong)))

      val version = table.nextVersion
      val rel = f"data/c$version%012d"
      val outDir = Paths.get(table.location).resolve(rel)
      merged.write.mode("overwrite").partitionBy("_bucket").parquet(outDir.toString)

      // lineage: per-bucket row counts of the rewritten buckets
      // (metadata-cheap: zero-column scan over just-written files)
      val wroteData = {
        val s = Files.list(outDir)
        try s.iterator().hasNext && {
          val s2 = Files.list(outDir)
          try s2.filter(p => p.getFileName.toString.startsWith("_bucket="))
            .iterator().hasNext
          finally s2.close()
        } finally s.close()
      }
      val countsByBucket: Map[Int, Long] =
        if (wroteData)
          spark.read.parquet(outDir.toString)
            .groupBy("_bucket").count().collect()
            .map(r => r.getInt(0) -> r.getLong(1)).toMap
        else Map.empty
      val rewritten: Map[Int, Option[String]] = touched.map { b =>
        b -> (if (countsByBucket.contains(b)) Some(s"$rel/_bucket=$b") else None)
      }.toMap

      val nUpserts = upserts.count()
      val nDeletes = firstAgg.getAs[Long]("dels")
      table.commit(schema, rewritten, countsByBucket, maxTx, batchId, Map(
        "events" -> nFresh, "upserts" -> nUpserts, "deletes" -> nDeletes,
        "bucketsTouched" -> touched.length.toLong))
      ApplyStats(version, nFresh, nUpserts, nDeletes,
        skippedReplay = false, maxTx, touched.length)
    } finally winners.unpersist()
  }

  /** Replay a changelog in `nBatches` txid-ordered batches (batch-mode
    * equivalent of the streaming tail; used by tests and Verify). */
  def replay(
      spark: SparkSession,
      table: LakeTable,
      events: DataFrame,
      nBatches: Int): Seq[ApplyStats] = {
    val bounds = events.agg(min("_txid"), max("_txid")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val step = math.max(1L, (hi - lo + nBatches) / nBatches)
    (0 until nBatches).map { i =>
      val from = lo + i * step
      val to = if (i == nBatches - 1) hi + 1 else math.min(lo + (i + 1) * step, hi + 1)
      applyBatch(spark, table,
        events.where(col("_txid") >= from && col("_txid") < to), batchId = -1L)
    }
  }
}
