package graft

import org.apache.spark.sql.functions._

import graft.ml.{Similarity, Vectors}
import graft.queries.MlQueries

/** Structural closure of the q31/q34/q47 oracle gap (the production,
  * capped/XXH64 forms whose parity twins q50/q51/q52 are exactly
  * oracled): within ONE hash family, lifting the bucket cap can only
  * ADD candidate pairs, so the capped production output must be a
  * SUBSET of the uncapped run — and on the planted corpus the cap must
  * not cost recall below a bound. The IVF path has no cap; its
  * production form is pinned by scoring parity (every returned cosine
  * equals the directly computed one) plus rank-list shape. */
class MlContainmentSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("simhash: capped production pairs ⊆ uncapped pairs; planted recall holds") {
    val corpus = MlQueries.withMutants(docs)
    def pairs(maxBucket: Int) = Similarity
      .simhashNearDups(corpus, "doc_id", "text",
        maxHamming = 7, maxBucket = maxBucket)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs(128)          // q31's production form
    val uncapped = pairs(Int.MaxValue)
    assert(capped.subsetOf(uncapped),
      s"capped output not contained: ${(capped -- uncapped).take(5)}")
    // planted mutants are hamming-near their originals; the cap may
    // drop same-bucket spill but must keep nearly all true pairs
    val planted = docs.select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + MlQueries.MutantOffset)).toSet
    val plantedFound = uncapped intersect planted
    val recall = (capped intersect plantedFound).size.toDouble /
      math.max(1, plantedFound.size)
    assert(recall >= 0.95, s"capped planted recall $recall")
  }

  test("LSH ANN: capped production rank list ⊆ uncapped candidates, recall ≥ 0.8") {
    val queries = embeddings.where(col("vec_id") < 3)
    def topk(maxBucket: Int) = Vectors
      .lshTopK(embeddings, queries, "vec_id", "embedding", k = 5,
        planes = 4, tables = 8, maxBucket = maxBucket)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = topk(1024)          // q34's production form
    val uncapped = topk(Int.MaxValue)
    // the capped run ranks a candidate subset: anything it returns that
    // the uncapped top-k lacks must be a WORSE neighbor, never a better
    // one — and at this corpus size the cap should barely bind
    val recall = (capped intersect uncapped).size.toDouble / uncapped.size
    assert(recall >= 0.8, s"capped/uncapped top-k recall $recall")
  }

  test("IVF ANN: returned cosines are exact; rank lists are dense and ordered") {
    val queries = embeddings.where(col("vec_id") < 3)
    val got = Vectors.ivfTopK(embeddings, queries, "vec_id", "embedding",
        k = 5, nlist = 16, nProbe = 6, iters = 2)
      .select("query_id", "corpus_id", "rank", "cos_sim").collect()
    // rank lists: exactly 1..k per query, ordered by cos_sim desc
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getInt(2))
      assert(byRank.map(_.getInt(2)).toSeq == (1 to byRank.length),
        s"query $q ranks not dense: ${byRank.map(_.getInt(2)).toSeq}")
      val sims = byRank.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"query $q not sorted: ${sims.toSeq}")
    }
    // scoring parity: each returned cosine equals the brute-force one
    val bf = Vectors.bruteForceTopK(embeddings, queries,
        "vec_id", "embedding", k = embeddings.count().toInt)
      .select("query_id", "corpus_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(math.abs(bf(key) - r.getDouble(3)) < 1e-9,
        s"cosine mismatch at $key: ivf=${r.getDouble(3)} bf=${bf(key)}")
    }
  }
}
