package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ml.{Similarity, Vectors}

/** Diagnostic: stage-by-stage timings of the q43 embed-neardups path
  * to locate where wall time goes at sf0.1 (2k vectors, dim 64). */
object Q43Probe {
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

    // warm up the session on an unrelated job
    spark.range(1000000).select(sum("id")).collect()

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val perturbed = e.select(col("vec_id").as("orig_id"), col("embedding"))
      .select((col("orig_id") + 100000L).as("vec_id"),
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => x.cast("double") * (lit(1.0) +
            ((conv(substring(md5(concat(col("orig_id").cast("string"),
              lit("|"), i.cast("string"))), 1, 6), 16, 10).cast("bigint")
              % 7).cast("double") - 3.0) / 100.0))
          .as("embedding"))
    val all = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("embedding"))
      .unionByName(perturbed)

    time("jitter+union count")(all.count())

    val v = all.select(col("vec_id").as("_id"),
        transform(col("embedding"), x => x.cast("double")).as("_v"))
      .withColumn("_n", Vectors.l2norm(col("_v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist v count")(v.count())

    val bucketed = v.select(col("_id"),
        explode(Vectors.lshBuckets(col("_v"), 12, 12)).as("b"))
      .select(col("_id"), col("b.tbl"), col("b.bkt"))
    time("bucketed count")(bucketed.count())
    time("bucketed count again")(bucketed.count())

    val wB = Window.partitionBy("tbl", "bkt").orderBy(xxhash64(col("_id")))
    val capped = bucketed.withColumn("_rn", row_number().over(wB))
      .where(col("_rn") <= 64).drop("_rn")
    time("capped count")(capped.count())

    val l = capped.select(col("tbl"), col("bkt"), col("_id").as("id_a"))
    val r = capped.select(col("tbl"), col("bkt"), col("_id").as("id_b"))
    val candidates = l.join(r, Seq("tbl", "bkt"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("candidates count")(candidates.count())

    val scored = candidates
      .join(v.select(col("_id").as("id_a"), col("_v").as("va"), col("_n").as("na")),
        Seq("id_a"))
      .join(v.select(col("_id").as("id_b"), col("_v").as("vb"), col("_n").as("nb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos_sim"))
      .where(col("cos_sim") >= 0.95)
    time("scored count")(scored.count())
    time("scored count again")(scored.count())

    v.unpersist()
    spark.stop()
  }
}
