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

  test("uncapped md5-fingerprint banding equals brute-force exhaustive hamming pairs") {
    val mutated = MlQueries.withMutants(docs)
    val banded = Similarity.simhashNearDups(mutated, "doc_id", "text",
        maxHamming = 7, maxBucket = Int.MaxValue,
        fingerprint = Similarity.md5SimHash60)
      .select("id_a", "id_b", "hamming")
    val fp = mutated.select(col("doc_id"),
      Similarity.md5SimHash60(col("text")).as("f"))
    val brute = fp.as("a").crossJoin(fp.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        Similarity.hamming(col("a.f"), col("b.f")).as("hamming"))
      .where(col("hamming") <= 7)
    // the 8×8-bit pigeonhole guarantee: hamming ≤ 7 ⇒ one chunk agrees,
    // so banded candidate generation loses NOTHING vs all-pairs
    assertSameRows(banded, brute)
    assert(banded.count() > 0)
  }

  test("md5 simhash60 fingerprint matches its SQL formulation (oracle parity)") {
    // the expression's digest math vs the conv(substr(md5)) built-in
    // path the DuckDB oracle mirrors — one token is one md5 prefix
    val one = docs.select(
      Similarity.md5SimHash60(lit("hello")).as("e"),
      conv(substr(md5(lit("hello")), lit(1), lit(15)), 16, 10).cast("long").as("h"))
      .head()
    // a single token votes its own bits: fingerprint == token hash
    assert(one.getLong(0) == one.getLong(1))
    // and the fingerprint stays within 60 bits
    val maxFp = docs.select(max(Similarity.md5SimHash60(col("text")))).head().getLong(0)
    assert(maxFp >= 0L && maxFp < (1L << 60))
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

  test("portable-bucket LSH ANN: partition-invariant, ranked, overlaps brute force") {
    val bucketer = (v: org.apache.spark.sql.Column) =>
      Vectors.lshBucketsPortable(v, 4, 8)
    def run(c: org.apache.spark.sql.DataFrame) =
      Vectors.lshTopK(c, c.where(col("vec_id") < 3), "vec_id", "embedding",
        k = 5, planes = 4, tables = 8, maxBucket = Int.MaxValue,
        bucketer = bucketer)
    val a = run(embeddings)
    val b = run(embeddings.repartition(7))
    assertSameRows(a, b) // md5-literal signs: no partitioning dependence
    val rows = a.collect()
    assert(rows.length > 0 &&
      rows.forall(r => r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 5))
    val brute = Vectors.bruteForceTopK(embeddings,
        embeddings.where(col("vec_id") < 3), "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((brute & got).size >= brute.size / 2,
      s"portable LSH overlap with brute force too low: ${(brute & got).size}/${brute.size}")
  }

  test("LSH ANN results are a subset-quality approximation of brute force") {
    val bf = Vectors.bruteForceTopK(embeddings,
        embeddings.where(col("vec_id") < 3), "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Vectors.lshTopK(embeddings,
        embeddings.where(col("vec_id") < 3), "vec_id", "embedding", 5, planes = 4, tables = 16)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // with 4 planes buckets are coarse — expect meaningful overlap
    val overlap = (bf intersect lsh).size.toDouble / bf.size
    assert(overlap >= 0.5, s"lsh/bf overlap $overlap")
    assert(lsh.nonEmpty)
  }

  test("IVF ANN: deterministic, self-excluded, meaningful overlap with brute force") {
    val bf = Vectors.bruteForceTopK(embeddings,
        embeddings.where(col("vec_id") < 3), "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Vectors.ivfTopK(embeddings,
        embeddings.where(col("vec_id") < 3), "vec_id", "embedding", 5,
        nlist = 16, nProbe = 6, iters = 2)
    val got = ivf.collect()
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall(r => r.getLong(1) != r.getLong(0)))
    // probing 6 of 16 lists scans ~38% of the corpus; near neighbors
    // cluster with their queries so overlap should well exceed that
    val overlap = (bf intersect pairs).size.toDouble / bf.size
    assert(overlap >= 0.5, s"ivf/bf overlap $overlap")
    // deterministic training: a second run returns identical pairs
    val again = Vectors.ivfTopK(embeddings,
        embeddings.where(col("vec_id") < 3), "vec_id", "embedding", 5,
        nlist = 16, nProbe = 6, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == pairs)
  }

  test("exactNearDups finds exactly the planted pairs with integer-exact counts") {
    val mutated = MlQueries.withMutants(docs)
    val out = Similarity.exactNearDups(mutated, "doc_id", "text",
      threshold = (7, 10)).collect()
    val found = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val nDocs = docs.count()
    val expected = (0L until nDocs).map(i => (i, i + MlQueries.MutantOffset)).toSet
    // docs ≥ 10 tokens → planted-pair jaccard ≥ 8/9 > 0.7; with 32
    // 2-row bands the per-pair miss probability is ≤ 4e-10
    assert(found == expected || (expected -- found).isEmpty,
      s"missing=${(expected -- found).take(5)} extra=${(found -- expected).take(5)}")
    out.foreach { r =>
      assert(r.getInt(2) * 10 >= r.getInt(3) * 7,
        s"pair below threshold leaked: $r")
    }
  }

  test("lshNearDups recovers planted embedding near-dups without corpus broadcast") {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val offset = 100000L
    val perturbed = e.select((col("vec_id") + offset).as("vec_id"),
      zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
        (x, i) => x.cast("double") * (lit(1.0) +
          (pmod(xxhash64(col("vec_id"), i), lit(7L)).cast("double") - 3.0) / 100.0))
        .as("embedding"))
    val all = e.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("embedding"))
      .unionByName(perturbed)
    val df = Vectors.lshNearDups(all, "vec_id", "embedding",
      minCosine = 0.95, planes = 12, tables = 12, maxBucket = 64)
    // the self-join path must never hint a broadcast of the corpus —
    // at 100 TB a corpus broadcast is an OOM, not a plan choice
    def noHint(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p.collect { case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h }.isEmpty
    assert(noHint(df.queryExecution.optimizedPlan), "broadcast hint in lshNearDups plan")
    val pairs = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = e.count()
    val expected = (0L until n).map(i => (i, i + offset)).toSet
    val recall = expected.count(pairs).toDouble / expected.size
    assert(recall >= 0.95, s"embedding near-dup recall $recall")
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

  test("minhash signature: null shingle elements contribute the seed (HOF parity)") {
    import spark.implicits._
    // oracle = the retired higher-order-function formulation expressed
    // with Spark built-ins: per j, min over elements of
    // xxhash64(j, xxhash64(s)) — xxhash64(null) folds the seed (42), so
    // arrays with containsNull=true must hash identically in both forms
    val k = 8
    val df = Seq(
      Tuple1(Seq("a", "b", null, "c")),
      Tuple1(Seq[String](null, null)),
      Tuple1(Seq("x"))
    ).toDF("shg")
    val sig = graft.functions.MinHashSigExpr.minhashSig(col("shg"), k)
    val rows = df.select(
      (0 until k).map(j => sig.getItem(j).as(s"g$j")) ++
      (0 until k).map(j => array_min(transform(col("shg"),
        s => xxhash64(lit(j), xxhash64(s)))).as(s"o$j")): _*).collect()
    rows.foreach { r =>
      (0 until k).foreach { j =>
        assert(r.getAs[Long](s"g$j") == r.getAs[Long](s"o$j"),
          s"j=$j: native ${r.getAs[Long](s"g$j")} != oracle ${r.getAs[Long](s"o$j")}")
      }
    }
  }

  test("real image decode: javax.imageio reads back synthesized PNG/JPEG headers") {
    import spark.implicits._
    val df = Seq((1L, 20, 10, "png"), (2L, 33, 47, "jpeg")).toDF("id", "w", "h", "f")
      .select(col("id"), col("w"), col("h"), col("f"),
        Multimodal.synthImage(col("w"), col("h"), col("f")).as("img"))
      .withColumn("meta", Multimodal.decodeImage(col("img")))
      .withColumn("resized", Multimodal.resizeMeta(col("meta"), 16))
    val rows = df.orderBy("id").collect()
    rows.foreach { r =>
      assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") == r.getAs[Int]("w"))
      assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("height") == r.getAs[Int]("h"))
      assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[String]("format") == r.getAs[String]("f"))
      assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("n_bytes") ==
        r.getAs[Array[Byte]]("img").length)
      val rs = r.getAs[org.apache.spark.sql.Row]("resized")
      assert(math.max(rs.getAs[Int]("width"), rs.getAs[Int]("height")) <= 17) // ceil rounds up
    }
    // undecodable bytes are data, not errors: meta is null
    val bad = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("img")
      .select(Multimodal.decodeImage(col("img")).as("meta")).head()
    assert(bad.isNullAt(0))
  }
}
