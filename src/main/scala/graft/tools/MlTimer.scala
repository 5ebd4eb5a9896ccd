package graft.tools

import org.apache.spark.sql.SparkSession

/** Quick timer for the heavy ML queries at sf0.1 (diagnostic). */
object MlTimer {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("q30_minhash_lsh_neardups", "q31_simhash_neardups",
        "q32_exact_jaccard_verify", "q43_embed_neardups")
      .foreach { n =>
        val t0 = System.nanoTime()
        val c = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
        println(f"mltime $n rows=$c ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    spark.stop()
  }
}
