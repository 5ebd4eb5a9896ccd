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
  *   1. within-batch collapse — latest txid wins per (conv_id,
  *      turn_idx) via row_number window (reference: `sort -r | uniq`
  *      idempotent dedupe, /root/reference/manta/dc_inputs_2b.sh:33-35);
  *   2. bucket pruning — only the hash-buckets the incoming keys map to
  *      are read and rewritten (reference analogue: per-split map
  *      tasks, /root/reference/manta/dc_inputs.sh:57-66);
  *   3. per-key version gate — an event takes effect only if its _txid
  *      exceeds the stored row's _txid. Deletes become TOMBSTONES
  *      (_deleted=true rows), so a stale update arriving after a newer
  *      delete cannot resurrect the key. This makes the final state a
  *      pure function of the event set — independent of arrival order,
  *      duplication, or batch boundaries (exactly-once = idempotent
  *      keyed upsert; reference analogue: `_etag` change detection,
  *      /root/reference/lib/backup_state.js:135-143);
  *   4. merge — survivors (left-anti) ∪ effective events;
  *   5. salted repartition before the write so one hot conversation
  *      cannot serialize a whole bucket into one task (north-rule skew
  *      mandate — the reference has no skew handling, SURVEY.md §4.1);
  *   6. atomic commit with txid high-watermark + per-bucket lineage
  *      counts. An entirely-ineffective batch (pure replay) commits
  *      nothing.
  *
  * Scale notes: the only full pass over the *batch* is one window
  * shuffle keyed (conv_id, turn_idx) — fine-grained, so conv-level skew
  * doesn't hit it. The target table is touched only on affected
  * buckets; the version-gate and survivor joins are keyed on the merge
  * key and AQE may broadcast the small side. Nothing scans unaffected
  * data. Tombstones accumulate only for deleted keys; compact() can
  * drop them once no older txids can arrive (watermark-bounded).
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

  /** Columns stored in the table: merge keys + payload + CDC metadata
    * (`_deleted` marks tombstones; readers filter them). */
  private def storedSchema(payload: StructType): StructType =
    StructType(payload.fields ++ Seq(
      StructField("_txid", LongType), StructField("_etag", StringType),
      StructField("_deleted", BooleanType)))

  def applyBatch(
      spark: SparkSession,
      table: LakeTable,
      events: DataFrame,
      batchId: Long = -1L,
      saltBuckets: Int = SaltBuckets): ApplyStats = {
    val prev = table.currentCommit()
    val prevWm = prev.map(_.txidWatermark).getOrElse(0L)
    if (batchId >= 0 && table.hasBatch(batchId))
      return ApplyStats(prev.map(_.version).getOrElse(0L), 0, 0, 0,
        skippedReplay = true, prevWm, 0)

    // schema evolution from the event envelope's payload columns
    val envelope = Set("_txid", "_op", "_etag", "_bucket", "_deleted")
    val payloadIn = StructType(events.schema.fields.filterNot(f => envelope(f.name)))
    val prevPayload = prev.map(c => StructType(
      c.schema.fields.filterNot(f => envelope(f.name)))).getOrElse(
      StructType(Seq(
        StructField("conv_id", StringType, nullable = false),
        StructField("turn_idx", IntegerType, nullable = false))))
    val payload = evolveSchema(prevPayload, payloadIn)
    val schema = storedSchema(payload)

    // 1. latest event wins per key within the batch (window §2.8);
    // _etag tiebreak only for determinism under duplicated txids
    val w = Window.partitionBy(Model.MergeKeys.map(col): _*)
      .orderBy(col("_txid").desc, col("_etag").desc_nulls_last)
    val winners = events
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .withColumn("_bucket", table.bucketCol(col("conv_id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // 2. bucket pruning: ≤ numBuckets values — tiny collect
      val touched = winners.select("_bucket").distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      val target = align(table.readBuckets(spark, touched), schema)

      // 3. per-key version gate: effect only if newer than stored row
      // (tombstones included in `target`, so delete-then-stale-update
      // resolves correctly)
      val tgtVersions = target.select(
        col("conv_id"), col("turn_idx"), col("_txid").as("__tgt_txid"))
      val effective = winners
        .join(tgtVersions, Model.MergeKeys, "left")
        .where(col("__tgt_txid").isNull || col("_txid") > col("__tgt_txid"))
        .drop("__tgt_txid")
        .persist(StorageLevel.MEMORY_AND_DISK)

      val effAgg = effective.agg(
        count(lit(1)).as("n"), max(col("_txid")).as("maxTx"),
        sum(when(col("_op") === "delete", 1L).otherwise(0L)).as("dels")).head()
      val nEff = effAgg.getAs[Long]("n")
      if (nEff == 0L) {
        effective.unpersist()
        return ApplyStats(prev.map(_.version).getOrElse(0L), 0, 0, 0,
          skippedReplay = false, prevWm, 0)
      }
      val maxTx = math.max(prevWm, effAgg.getAs[Long]("maxTx"))
      val nDeletes = effAgg.getAs[Long]("dels")

      // 4. merge: untouched target rows ∪ effective events (deletes
      // materialize as tombstones with payload nulled)
      val survivors = target.join(
        effective.select(Model.MergeKeys.map(col): _*), Model.MergeKeys, "left_anti")
      val keyCols = Model.MergeKeys.toSet
      val isDel = effective.col("_op") === "delete"
      val upsertRows = effective.select(schema.fields.map { f =>
        if (f.name == "_deleted") isDel.as("_deleted")
        else if (keyCols(f.name) || f.name == "_txid" || f.name == "_etag")
          col(f.name).cast(f.dataType).as(f.name)
        else if (effective.columns.contains(f.name))
          when(isDel, lit(null)).otherwise(col(f.name)).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)

      val merged = survivors.unionByName(upsertRows)
        .withColumn("_bucket", table.bucketCol(col("conv_id")))
        // 5. salt: hot conv_ids spread across tasks inside their bucket
        .repartition(col("_bucket"),
          pmod(xxhash64(col("conv_id"), col("turn_idx")), lit(saltBuckets.toLong)))

      val version = table.nextVersion
      val rel = f"data/c$version%012d"
      val outDir = Paths.get(table.location).resolve(rel)
      merged.write.mode("overwrite").partitionBy("_bucket").parquet(outDir.toString)

      // 6. lineage: per-bucket row counts of the rewritten buckets
      // (metadata-cheap: zero-column scan over just-written files)
      val wroteData = {
        import scala.jdk.CollectionConverters._
        val s = Files.list(outDir)
        try s.iterator().asScala.exists(_.getFileName.toString.startsWith("_bucket="))
        finally s.close()
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

      table.commit(schema, rewritten, countsByBucket, maxTx, batchId, Map(
        "events" -> nEff, "upserts" -> (nEff - nDeletes), "deletes" -> nDeletes,
        "bucketsTouched" -> touched.length.toLong))
      effective.unpersist()
      ApplyStats(version, nEff, nEff - nDeletes, nDeletes,
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
