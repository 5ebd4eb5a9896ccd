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
    CdcStream.writeSegment(Corpus.shuffled(events), logDir, parts = 3)

    val lines = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .text(logDir)
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
