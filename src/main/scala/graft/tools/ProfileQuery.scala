package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Run named queries once with a job listener and print every Spark
  * job's wall time plus the driver-side gap — decomposes a query's
  * bench seconds into its job timeline (guide §1: measure first).
  * Separate main; the frozen Bench harness is untouched.
  *
  * Usage: runMain graft.tools.ProfileQuery q30_minhash_lsh_neardups ...
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_PROFILE_REPS", "1").toInt
    val localDir = {
      val shm = java.nio.file.Paths.get("/dev/shm/graft-spark-local")
      try { java.nio.file.Files.createDirectories(shm); shm.toString }
      catch { case _: Throwable => System.getProperty("java.io.tmpdir") }
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val recorded = scala.collection.mutable.ArrayBuffer[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (desc, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (desc, t0) =>
          recorded.synchronized {
            recorded += ((je.jobId, desc, (je.time - t0) / 1000.0))
          }
        }
      }
    })

    val names =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    (0 until reps).foreach { rep =>
      if (rep > 0) spark.catalog.clearCache()
      names.foreach { name =>
        recorded.synchronized { recorded.clear() }
        spark.sparkContext.setJobDescription(s"profile:$name")
        val t0 = System.nanoTime()
        try graft.SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable => println(s"FAIL $name: $e") }
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        val snap = recorded.synchronized { recorded.toList.sortBy(_._1) }
        val jobSum = snap.map(_._3).sum
        println(f"PROFILE rep=$rep $name wall=$wall%.3f jobs=${snap.size} jobSum=$jobSum%.3f driverGap=${wall - jobSum}%.3f")
        snap.foreach { case (id, desc, s) =>
          println(f"  job $id%4d $s%7.3f s  ${desc.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
