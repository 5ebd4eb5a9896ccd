package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *  - the table's commit log records (queryId, batchId, txid
  *    watermark), so a replayed batch is detected and skipped
  *    (idempotent sink) — the pair is exactly-once. The queryId scopes
  *    the check to THIS checkpoint (Delta's txnAppId/txnVersion shape):
  *    batch ids restart at 0 per checkpoint, so a bare-batchId check
  *    would silently drop the first batches of a new checkpoint pointed
  *    at an existing table.
  *
  * Novel-field absorption / schema evolution: each micro-batch is
  * re-parsed with `spark.read.json` schema inference, so a field that
  * first appears mid-stream (e.g. `tool`) surfaces as a new column and
  * CdcApply widens the table schema on commit (reference analogue:
  * novel-key sweep into `_s`, lib/moraydump_reorg.js:501-529) — unless
  * the field is in `ignoreFields` (manifest `source.ignore`,
  * lib/wf_keys_tojson.js:113-134).
  *
  * Lineage (reference P6, lib/moraydump_reorg.js:179-192,589-592):
  * every line carries its source file via the file source's
  * `_metadata.file_path`; per-(datacenter, file) event counts ride into
  * the commit metrics and IngestMetrics. The datacenter is the
  * changelog subdirectory name (layout `<changelogDir>/<dc>/segment-*`);
  * flat layouts get dc = "default".
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

  /** Stable stream identity for sink-side idempotence: derived from the
    * checkpoint location, so a resumed stream keeps its identity and a
    * NEW checkpoint (whose batch ids restart at 0) gets a new one. */
  def queryIdFor(checkpointDir: String): String =
    "ckpt-" + java.util.UUID.nameUUIDFromBytes(
      checkpointDir.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString

  def start(
      spark: SparkSession,
      changelogDir: String,
      table: LakeTable,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 16,
      ignoreFields: Set[String] = Set.empty,
      onBatch: (Long, graft.cdc.ApplyStats) => Unit = (_, _) => ()): StreamingQuery = {
    val queryId = queryIdFor(checkpointDir)
    val lines: DataFrame = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true")
      .text(changelogDir)
      .select(col("value").cast("string").as("value"),
        col("_metadata.file_path").as("_path"))

    lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val session = batch.sparkSession
        import session.implicits._
        // per-batch schema inference (batch-local novel-field detection):
        // infer on the values once, then parse keeping the lineage path
        val inferred = session.read.json(
          batch.select("value").as[String](org.apache.spark.sql.Encoders.STRING))
        if (inferred.columns.contains("_txid")) {
          // datacenter = the first directory level under the changelog
          // root (layout <root>/<dc>/.../segment-files); anything
          // shallower reads as "default". Globs in changelogDir are cut
          // before taking the root's basename.
          val rootBase = {
            val cut = changelogDir.indexWhere(c => "*?[".contains(c))
            val prefix = if (cut >= 0) {
              val p = changelogDir.substring(0, cut)
              p.substring(0, math.max(p.lastIndexOf('/'), 0))
            } else changelogDir.stripSuffix("/")
            prefix.substring(prefix.lastIndexOf('/') + 1)
          }
          val dcPattern = ".*/" + java.util.regex.Pattern.quote(rootBase) + "/([^/]+)/.*"
          val parsed = batch.select(
              from_json(col("value"), inferred.schema).as("e"), col("_path"))
            .select(col("e.*"),
              regexp_extract(col("_path"), "([^/]+)$", 1).as("_origin_file"),
              coalesce(nullif(
                regexp_extract(col("_path"), dcPattern, 1), lit("")),
                lit("default")).as("_origin_dc"))
          val events = normalize(parsed)
          val t0 = System.nanoTime()
          // ONE summary agg per batch: per-DC lineage counters, distinct
          // origin files, and the newest event time (ingest-lag input) —
          // grouping sets keep it a single job instead of three
          val hasTs = events.columns.contains("ts")
          val summary = events.groupBy("_origin_dc").agg(
            count(lit(1)).as("n"),
            countDistinct(col("_origin_file")).as("nf"),
            (if (hasTs) max(col("ts")).cast("long")
             else lit(null).cast("long")).as("maxTs")).collect()
          val lineage: Map[String, Long] = summary
            .map(r => s"dc:${r.getString(0)}" -> r.getLong(1)).toMap
          val nFiles = summary.map(_.getLong(2)).sum
          val maxTs = summary.flatMap(r =>
            if (r.isNullAt(3)) None else Some(r.getLong(3)))
          val stats = CdcApply.applyBatch(session, table, events,
            batchId = batchId, queryId = queryId, ignoreFields = ignoreFields,
            extraMetrics = lineage + ("originFiles" -> nFiles))
          val ms = (System.nanoTime() - t0) / 1000000
          // ingest lag: wall-clock minus newest event time in the batch
          // (north-star metric; negative/absent ts → no lag reading)
          if (stats.applied > 0 && maxTs.nonEmpty) {
            val lagMs = System.currentTimeMillis() - maxTs.max * 1000L
            IngestMetrics.record(table.location, batchId, lagMs, ms, stats)
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
      maxFilesPerTrigger: Int = 16,
      ignoreFields: Set[String] = Set.empty): Unit = {
    val q = start(spark, changelogDir, table, checkpointDir, maxFilesPerTrigger,
      ignoreFields)
    q.awaitTermination()
  }
}
