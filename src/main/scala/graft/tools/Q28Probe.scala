package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.LakeTable

/** Diagnostic: stage-by-stage wall breakdown of q28 (NDJSON segment
  * write → streaming tail replay → final read) plus per-job/per-stage
  * listeners, to locate streaming-harness floor costs at sf0.1. Set
  * GRAFT_STREAM_DEBUG=1 to also get CdcStream's internal phase
  * timings (inferSchema / summarize / applyBatch) and batch row
  * counts. Round-4 findings recorded in BASELINE.md: (a) the
  * datacenter regexp_extract backtracked ~30µs/row — replaced with
  * substring_index; (b) writeSegment's coalesce(parts) silently wrote
  * ONE file from a 1-partition frame, collapsing the replay into a
  * single micro-batch — fixed with a repartition fallback. */
object Q28Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val localDir = {
      val shm = java.nio.file.Paths.get("/dev/shm/graft-spark-local")
      try { java.nio.file.Files.createDirectories(shm); shm.toString }
      catch { case _: Throwable => System.getProperty("java.io.tmpdir") }
    }
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000).select(sum("id")).collect() // session warmup
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStart.put(e.jobId, System.nanoTime())
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobStart.remove(e.jobId)
          if (t0 != 0L) {
            val ms = (System.nanoTime() - t0) / 1000000
            if (ms >= 300) println(s"PROBE   job ${e.jobId} ${ms}ms")
          }
        }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(0L)
          if (wall >= 500) println(
            s"PROBE   stage ${si.stageId} ${wall}ms tasks=${si.numTasks} " +
              s"cpuMs=${si.taskMetrics.executorCpuTime / 1000000} :: " +
              si.name.take(60))
        }
      })
    (1 to 2).foreach { round =>
      val base = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target/scratch"), "q28probe-").toString
      val events = graft.queries.CdcQueries.asChangeEvents(spark, sfDir)
      time(s"r$round events count")(events.count())
      time(s"r$round writeSegment")(
        graft.streaming.CdcStream.writeSegment(events, s"$base/log", parts = 4))
      val table = new LakeTable(s"$base/table", numBuckets = 16)
      time(s"r$round stream runOnce")(
        graft.streaming.CdcStream.start(spark, s"$base/log", table,
          s"$base/ckpt", maxFilesPerTrigger = 2,
          onBatch = (ms, st) =>
            println(s"PROBE   batch applied=${st.applied} ${ms}ms"))
          .awaitTermination())
      time(s"r$round final read+count")(table.read(spark).count())
    }
    spark.stop()
  }
}
