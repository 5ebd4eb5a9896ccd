package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Expression-layer scaling bisect: times one expression family at a
  * time over spark.range to find per-row constructs that serialize
  * under many threads (diagnostic tool). */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = if (args.length > 1) args(1).toLong else 50000000L
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.range(0, n, 1, cpus * 4)
    def time(name: String)(c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      base.select(max(c)).head()
      println(f"""{"expr":"$name","cpus":$cpus,"secs":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    }
    {
      // full corpus column set, no union — isolates the combination
      val ev = graft.model.Corpus.changeEvents(spark, n / 3, nConvs = 100000,
        maxTurns = 40, partitions = cpus * 4)
        .where(col("_txid") % 37L =!= 0L) // defeat the dup-union reuse
      val t0 = System.nanoTime()
      ev.select(max(col("_etag"))).head()
      println(f"""{"expr":"corpus_combo","cpus":$cpus,"secs":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    }
    time("xxhash64")(xxhash64(col("id")))
    time("format_string")(format_string("conv%08d", col("id")))
    time("md5")(md5(col("id").cast("string")))
    time("concat_cast")(concat(lit("x"), col("id").cast("string")))
    time("timestamp_seconds")(timestamp_seconds(col("id") % 1000000L))
    spark.stop()
  }
}
