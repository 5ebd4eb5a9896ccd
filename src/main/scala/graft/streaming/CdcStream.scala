package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.cdc.CdcApply
import graft.table.LakeTable

/** The streaming CDC tail: an NDJSON changelog directory (the
  * binlog/WAL analogue of the reference's periodic Moray dumps,
  * /root/reference/manta/dc_inputs.sh:28-37) tailed with the file
  * source and applied to the lake table once per micro-batch via
  * foreachBatch → [[CdcApply.applyBatch]].
  *
  * Exactly-once across crashes comes from BOTH sides:
  *  - Spark's checkpoint replays an unacknowledged micro-batch after
  *    restart (at-least-once delivery);
  *  - the table's commit log records (batchId, txid watermark), so a
  *    replayed batch is detected and skipped (idempotent sink) — the
  *    pair is exactly-once.
  *
  * Novel-field absorption / schema evolution: each micro-batch is
  * re-parsed with `spark.read.json` schema inference, so a field that
  * first appears mid-stream (e.g. `tool`) surfaces as a new column and
  * CdcApply widens the table schema on commit (reference analogue:
  * novel-key sweep into `_s`, lib/moraydump_reorg.js:501-529).
  */
object CdcStream {

  /** Spark's JSON writer defaults to millisecond timestamps; changelog
    * segments must round-trip microseconds or replayed rows differ from
    * the source by sub-ms truncation. */
  val TimestampFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Write one NDJSON changelog segment with lossless timestamps
    * (both zoned and NTZ variants — parquet-sourced ts columns are
    * often TIMESTAMP_NTZ). */
  def writeSegment(df: DataFrame, path: String, parts: Int = 1): Unit =
    df.coalesce(parts).write.mode("overwrite")
      .option("timestampFormat", TimestampFormat)
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .json(path)

  /** Cast inferred envelope/known columns to their contract types;
    * leave any novel payload columns as inferred. */
  def normalize(df: DataFrame): DataFrame = {
    val casts = Map(
      "_txid" -> "bigint", "_op" -> "string", "_etag" -> "string",
      "conv_id" -> "string", "turn_idx" -> "int",
      "role" -> "string", "text" -> "string", "tool" -> "string",
      "ts" -> "timestamp")
    df.select(df.columns.map { c =>
      casts.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))
    }.toIndexedSeq: _*)
  }

  def start(
      spark: SparkSession,
      changelogDir: String,
      table: LakeTable,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 16,
      onBatch: (Long, graft.cdc.ApplyStats) => Unit = (_, _) => ()): StreamingQuery = {
    val lines: Dataset[String] = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(changelogDir)
      .select(col("value").cast("string")).as[String](org.apache.spark.sql.Encoders.STRING)

    lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[String], batchId: Long) =>
        val session = batch.sparkSession
        // per-batch schema inference (batch-local novel-field detection)
        val events = normalize(session.read.json(batch))
        if (events.columns.contains("_txid")) {
          val t0 = System.nanoTime()
          val stats = CdcApply.applyBatch(session, table, events, batchId = batchId)
          val ms = (System.nanoTime() - t0) / 1000000
          // ingest lag: wall-clock minus newest event time in the batch
          // (north-star metric; negative/absent ts → no lag reading)
          if (stats.applied > 0 && events.columns.contains("ts")) {
            val maxTs = events.agg(max(col("ts")).cast("long")).head()
            if (!maxTs.isNullAt(0)) {
              val lagMs = System.currentTimeMillis() - maxTs.getLong(0) * 1000L
              IngestMetrics.record(table.location, batchId, lagMs, ms, stats)
            }
          }
          onBatch(ms, stats)
        }
        ()
      }
      .start()
  }

  /** Tail the changelog until everything currently present is applied
    * (AvailableNow trigger), then return. Resume = call again with the
    * same checkpointDir after more files arrive. */
  def runOnce(
      spark: SparkSession,
      changelogDir: String,
      table: LakeTable,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 16): Unit = {
    val q = start(spark, changelogDir, table, checkpointDir, maxFilesPerTrigger)
    q.awaitTermination()
  }
}
