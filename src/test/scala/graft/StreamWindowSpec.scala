package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Corpus
import graft.streaming.CdcStream

/** Watermarked windowed aggregation over the change-event stream
  * (SURVEY.md §2.12 last row): the engine's correctness never depends
  * on watermarks (upserts are key-idempotent under the txid order),
  * but operational metrics — events per conversation per window — run
  * as a standard Structured Streaming windowed agg with late-data
  * eviction. This spec pins that surface: watermark + tumbling window
  * + append mode, results equal to the batch computation of the same
  * windows once every window is closed.
  */
class StreamWindowSpec extends SparkSpec {

  test("watermarked tumbling-window counts equal the batch windows after close") {
    val events = Corpus.changeEvents(spark, 2000, nConvs = 20, maxTurns = 8)
    val logDir = tmpDir("win-log")
    // three ts-RANGED segments, shuffled WITHIN each range: arrival is
    // watermark-monotone across batches (the "equal to batch once
    // closed" contract needs no row to arrive after its window
    // closed), while within-batch disorder still exercises the agg.
    // Segment dirs are written in ts order so the file source's
    // mod-time ordering replays them in ts order. (A fully shuffled
    // multi-batch stream WOULD late-drop rows — that lossy path is
    // exactly what watermarks are for and not what this spec pins.
    // Until round 4, writeSegment's coalesce silently collapsed this
    // corpus to ONE file, so the old shuffled form ran as a single
    // batch and never exercised cross-batch eviction at all.)
    val bounds = events.withColumn("tsl", col("ts").cast("long"))
      .stat.approxQuantile("tsl", Array(0.34, 0.67), 0.01)
    val tsl = col("ts").cast("long")
    Seq(
      tsl <= bounds(0),
      tsl > bounds(0) && tsl <= bounds(1),
      tsl > bounds(1)).zipWithIndex.foreach { case (cond, i) =>
      CdcStream.writeSegment(
        Corpus.shuffled(events.where(cond)), s"$logDir/seg$i")
    }

    val lines = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .text(s"$logDir/seg*")
    val parsed = lines.select(
        get_json_object(col("value"), "$.conv_id").as("conv_id"),
        get_json_object(col("value"), "$.ts").cast("timestamp").as("ts"))
      .where(col("ts").isNotNull)
    // 10-minute lateness bound; 5-minute tumbling windows
    val windowed = parsed
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("conv_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("conv_id"), col("n"))

    val q = windowed.writeStream
      .option("checkpointLocation", tmpDir("win-ckpt"))
      .format("memory").queryName("win_counts")
      .outputMode("append") // append emits only watermark-closed windows
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("win_counts")
    // batch truth over the same input, restricted to windows the
    // watermark has provably closed (end + lateness <= max event time)
    val batch = events.where(col("ts").isNotNull)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("conv_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("conv_id"), col("n"))
    val maxTs = events.agg(max("ts")).head().getTimestamp(0)
    val closed = batch.where(
        col("win_end") <= lit(new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)))
      .drop("win_end")
    assert(got.count() > 0, "no closed windows emitted")
    assertSameRows(got, closed)
  }
}
