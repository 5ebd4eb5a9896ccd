package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profile the steady-state CDC apply floor: replicate Bench's steady
  * section (same corpus, same batch sizes) with a SparkListener that
  * records every Spark job's wall time, so the fixed per-batch cost
  * decomposes into (job1, job2, ..., driver gap). Separate main so the
  * frozen Bench harness is untouched (guide §1.4/§1.5).
  *
  * Usage: runMain graft.tools.ProfileSteady [nEvents] [batches]
  */
object ProfileSteady {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(2000000L)
    val steadyBatches = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = {
      val shm = java.nio.file.Paths.get("/dev/shm/graft-spark-local")
      try { java.nio.file.Files.createDirectories(shm); shm.toString }
      catch { case _: Throwable => System.getProperty("java.io.tmpdir") }
    }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
    // A/B probe for the plan-string hypothesis (thread dumps showed
    // generateTreeString hot on the driver): cap the eager plan
    // description Spark renders per executed query
    sys.env.get("GRAFT_MAXPLANSTR").foreach(v =>
      builder.config("spark.sql.maxPlanStringLength", v))
    // A/B probe: how much of the apply floor is AQE stage-by-stage
    // execution (per-stage jobs + re-optimization between them)?
    sys.env.get("GRAFT_AQE").foreach(v =>
      builder.config("spark.sql.adaptive.enabled", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // job-time listener: (jobId, description, wall ms)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long)]()
    val recorded = scala.collection.mutable.ArrayBuffer[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (desc, js.time, 0L))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (desc, t0, _) =>
          recorded.synchronized {
            recorded += ((je.jobId, desc, (je.time - t0) / 1000.0))
          }
        }
      }
    })

    // same disk as the frozen bench's scratch (profiling fidelity);
    // deleted at the end so repeated profiling runs cannot accumulate
    val scratch = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "profile-cdc-").toString
    graft.model.Corpus.changeEvents(spark, nEvents,
        nConvs = (nEvents / 200).toInt.max(1000), maxTurns = 40,
        partitions = cpus.toInt * 4)
      .write.mode("overwrite").parquet(s"$scratch/changelog")
    val events = spark.read.parquet(s"$scratch/changelog")

    val per = (nEvents / 20).max(1L)
    val steadyTable = new graft.table.LakeTable(s"$scratch/steady", numBuckets = 64)
    spark.sparkContext.setJobDescription("warm: bulk preload")
    graft.cdc.CdcApply.applyBatch(spark, steadyTable,
      events.where(col("_txid") <= nEvents - steadyBatches * per), pruneBuckets = false)

    (0 until steadyBatches).foreach { i =>
      val lo = nEvents - (steadyBatches - i) * per + 1
      val hi = nEvents - (steadyBatches - i - 1) * per
      recorded.synchronized { recorded.clear() }
      spark.sparkContext.setJobDescription(s"steady batch $i")
      val t0 = System.nanoTime()
      graft.cdc.CdcApply.applyBatch(spark, steadyTable,
        events.where(col("_txid").between(lo, hi)))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      val snap = recorded.synchronized { recorded.toList.sortBy(_._1) }
      val jobSum = snap.map(_._3).sum
      println(f"STEADY batch=$i wall=$wall%.3f s jobs=${snap.size} jobSum=$jobSum%.3f driverGap=${wall - jobSum}%.3f")
      snap.foreach { case (id, desc, s) =>
        println(f"  job $id%4d $s%7.3f s  $desc")
      }
    }
    spark.stop()
    graft.table.LakeTable.deleteRecursively(java.nio.file.Paths.get(scratch))
  }
}
