package graft

import org.apache.spark.sql.functions._

import graft.ml.{Multimodal, Similarity, Vectors}
import graft.queries.MlQueries

class MlSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("minhash LSH recovers every planted mutant pair, no self-pairs") {
    val mutated = MlQueries.withMutants(docs)
    val pairs = Similarity.minhashNearDups(mutated, "doc_id", "text",
      threshold = 0.5).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val nDocs = docs.count()
    val expected = (0L until nDocs).map(i => (i, i + MlQueries.MutantOffset)).toSet
    val recall = expected.count(found).toDouble / expected.size
    assert(recall >= 0.95, s"minhash recall $recall") // LSH is probabilistic
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0))
  }

  test("simhash recovers near-identical mutants within hamming 3") {
    val mutated = MlQueries.withMutants(docs)
    val pairs = Similarity.simhashNearDups(mutated, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nDocs = docs.count()
    val expected = (0L until nDocs).map(i => (i, i + MlQueries.MutantOffset))
    val recall = expected.count(pairs).toDouble / expected.size
    assert(recall >= 0.9, s"simhash recall $recall")
  }

  test("exact jaccard of planted pairs is high; unrelated docs low") {
    val mutated = MlQueries.withMutants(docs)
    import spark.implicits._
    val planted = Seq((0L, MlQueries.MutantOffset + 0L),
      (1L, MlQueries.MutantOffset + 1L), (0L, 1L)).toDF("id_a", "id_b")
    val j = Similarity.exactJaccard(mutated, "doc_id", "text", planted)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((0L, MlQueries.MutantOffset)) > 0.8)
    assert(j((1L, MlQueries.MutantOffset + 1L)) > 0.8)
    assert(j((0L, 1L)) < 0.5)
  }

  test("simhash is per-row deterministic and order-insensitive to partitioning") {
    val a = docs.select(col("doc_id"), Similarity.simhash64(col("text")).as("sh"))
    val b = docs.repartition(7)
      .select(col("doc_id"), Similarity.simhash64(col("text")).as("sh"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("brute-force ANN: self-similarity excluded, ranks contiguous, cos in [-1,1]") {
    val topk = Vectors.bruteForceTopK(embeddings,
      embeddings.where(col("vec_id") < 3), "vec_id", "embedding", 5).collect()
    assert(topk.length == 15)
    assert(topk.forall(r => r.getLong(1) != r.getLong(0)))
    assert(topk.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val byQuery = topk.groupBy(_.getLong(0))
    assert(byQuery.values.forall(_.map(_.getInt(3)).sorted.toSeq == (1 to 5)))
  }

  test("LSH ANN results are a subset-quality approximation of brute force") {
    val bf = Vectors.bruteForceTopK(embeddings,
        embeddings.where(col("vec_id") < 3), "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Vectors.lshTopK(embeddings,
        embeddings.where(col("vec_id") < 3), "vec_id", "embedding", 5, planes = 4, tables = 8)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // with 4 planes buckets are coarse — expect meaningful overlap
    val overlap = (bf intersect lsh).size.toDouble / bf.size
    assert(overlap >= 0.5, s"lsh/bf overlap $overlap")
    assert(lsh.nonEmpty)
  }

  test("multimodal stub: decode/resize/frame-sample plumbing shapes") {
    val q = MlQueries.defs.find(_.name == "q36_multimodal_decode").get
    val out = q.fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (rw, rh) = (r.getAs[Int]("rw"), r.getAs[Int]("rh"))
      assert(w >= 1 && w <= 1920 && h >= 1 && h <= 1080)
      assert(rw <= 512 && rh <= 512 && rw >= 1 && rh >= 1)
      assert(Set("png", "jpeg", "webp").contains(r.getAs[String]("format")))
      val nf = r.getAs[Int]("n_frames")
      assert(r.getAs[Long]("n_sampled_frames") == (nf + 23) / 24)
    }
  }
}
