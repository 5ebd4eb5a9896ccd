package graft.tools

import org.apache.spark.sql.SparkSession

/** Quick per-query timer (diagnostic): `runMain graft.tools.MlTimer
  * [query ...]` times the named SparkEntry queries at
  * SPARK_GRAFT_SF_DIR (default sf0.1); no args = the heavy ML set. */
object MlTimer {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
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
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q30_minhash_lsh_neardups", "q31_simhash_neardups",
        "q32_exact_jaccard_verify", "q43_embed_neardups")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"qtime $n rows=$c ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
