package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.cdc.ApplyStats

/** Ingest-lag + apply metrics per micro-batch, appended as one JSON
  * line per batch to `<table>/_metrics/ingest.jsonl` (north-star
  * observability: per-partition lineage counters live in the commit
  * log; the stream-level lag/latency series lives here). Wall-clock
  * based by design — this is telemetry, not table state, so it does
  * not affect replay determinism. */
object IngestMetrics {
  def record(tableLocation: String, batchId: Long, lagMs: Long,
      applyMs: Long, stats: ApplyStats): Unit = {
    val dir = Paths.get(tableLocation, "_metrics")
    Files.createDirectories(dir)
    val line =
      s"""{"batchId":$batchId,"ingestLagMs":$lagMs,"applyMs":$applyMs,""" +
      s""""applied":${stats.applied},"upserts":${stats.upserts},""" +
      s""""deletes":${stats.deletes},"version":${stats.version},""" +
      s""""txidWatermark":${stats.txidWatermark},""" +
      s""""bucketsTouched":${stats.bucketsTouched}}""" + "\n"
    Files.writeString(dir.resolve("ingest.jsonl"), line,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def read(tableLocation: String): Seq[String] = {
    val f = Paths.get(tableLocation, "_metrics", "ingest.jsonl")
    if (Files.exists(f)) Files.readAllLines(f).toArray.toSeq.map(_.toString)
    else Seq.empty
  }
}
