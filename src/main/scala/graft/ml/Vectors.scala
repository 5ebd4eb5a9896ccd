package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH bucketed variant as the scale path. Vector math is
  * higher-order column expressions in double precision — codegen'd,
  * per-row, shuffle-free until the top-k/bucket step.
  */
object Vectors {

  /** Elementwise dot product of two array columns, folded in doubles.
    * Native codegen'd ([[graft.functions.DotDoubleExpr]]): the HOF
    * `aggregate(zip_with(...))` form ran interpreted at ~dim tree
    * walks per row; the fold order (and so every IEEE bit) is
    * unchanged — VectorMathSpec asserts exact-bits equality against
    * the HOF forms, which stay below as the spec's oracle. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorMath.dot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** One-pass native cosine — same three folds and the same final
    * `dot / (sqrt(aa) * sqrt(bb))` operation order as the HOF form. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorMath.cosine(a, b)

  /** Pre-round-6 HOF formulations, kept as the equivalence oracles for
    * VectorMathSpec (never on a hot path). */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
  private[graft] def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))
  private[graft] def unitHof(v: Column): Column =
    transform(v, x => x.cast("double") / sqrt(dotHof(v, v)))
  private[graft] def unitQuantHof(v: Column): Column =
    transform(unitHof(v), x => round(x * 1000).cast("long"))
  private[graft] def dotLongHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), _ + _)

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * Queries are broadcast (small side); the corpus scan is one pass;
    * per-query ranking is a window over the cross product. At 100 TB
    * this is the verification path — the LSH variant is the serving
    * path.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = Similarity.spread(corpus)
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("cv"), col("qv")).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** All L table buckets for a vector in one per-row expression:
    * array of struct(tbl, bkt). The bucket keys come from the native
    * codegen'd [[graft.functions.LshBucketsExpr]] (tight multiply-add
    * loop over a cached ±1 sign table); the only higher-order lambda
    * left here wraps the `tables`-element key array into structs —
    * O(tables) per row, not O(tables×planes×dim). The previous
    * HOF-everything formulation evaluated ~9.2k interpreted
    * xxhash64 calls per row at the 12×12×64 defaults and dominated
    * the q43 wall time. */
  def lshBuckets(vec: Column, planes: Int, tables: Int): Column =
    transform(
      graft.functions.LshBucketsExpr.lshBucketKeys(vec, planes, tables),
      (bkt, t) => struct(t.cast("int").as("tbl"), bkt.as("bkt")))

  /** ENGINE-PORTABLE bucketing for the q34/q51 oracles: the plane sign
    * for (table, plane, dim) is the parity of the first hex digit of
    * md5("t:p:i") — recomputable in any engine with md5 — and the
    * projection runs over the embedding QUANTIZED to round(x*1000)
    * longs with INTEGER accumulation, so the sign decision is exactly
    * order-independent (no FP-summation hazard at proj ≈ 0). Runs as
    * the native expression's quantized mode — one md5 sign family for
    * the fast path and the portable path (the previous higher-order-
    * function formulation with typedLit sign arrays ran interpreted at
    * ~tables×planes×dim tree walks per row, ~3 s of q34/q51's bench). */
  def lshBucketsPortable(vec: Column, planes: Int, tables: Int): Column =
    transform(
      graft.functions.LshBucketsExpr.lshBucketKeys(vec, planes, tables,
        quantized = true),
      (bkt, t) => struct(t.cast("int").as("tbl"), bkt.as("bkt")))

  /** ANN via multi-table random-hyperplane LSH for a SMALL query set:
    * bucket the corpus and queries with L independent plane sets; a
    * pair is a candidate if it collides in ANY table (recall ≈
    * 1-(1-p^planes)^L). Rank within candidates. `planes` trades bucket
    * size vs selectivity; `tables` trades recall vs work — the standard
    * production ANN shape.
    *
    * The query side is broadcast, so this path is ONLY for genuinely
    * small query sets (point lookups, eval batches). Corpus-scale
    * symmetric near-dup search goes through [[lshNearDups]], which
    * never broadcasts. `maxBucket` caps each corpus (tbl, bkt) group so
    * a direction-clustered corpus cannot degenerate the candidate join
    * to O(n²/2^planes); candidates carry ids only — vectors re-join
    * once after dedup, instead of dragging both double-arrays through
    * the dropDuplicates shuffle. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planes: Int = 8, tables: Int = 8, maxBucket: Int = 1024,
      bucketer: Column => Column = null,
      evict: Column => Column = xxhash64(_)): DataFrame = {
    val mkBuckets: Column => Column =
      if (bucketer != null) bucketer else lshBuckets(_, planes, tables)
    def bucketed(df: DataFrame, id: String, vec: String) =
      df.select(col(id), explode(mkBuckets(col(vec))).as("b"))
        .select(col(id), col("b.tbl"), col("b.bkt"))
    // NOT spread: the per-row work here is the native bucketer (µs/row)
    // and cv is consumed twice without a persist, so a repartition
    // would run twice and cost more than the single-split scan saves
    // (measured: q34 1.0 s → 1.5 s with spread)
    val cv = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // `evict` swaps the cap's eviction key (default Spark-internal
    // xxhash64; q34 passes md5-of-id so its oracle reproduces the cap);
    // the id tiebreak makes eviction deterministic under key collisions
    val wB = Window.partitionBy("tbl", "bkt")
      .orderBy(evict(col("corpus_id")), col("corpus_id"))
    val c = bucketed(cv, "corpus_id", "cv")
      .withColumn("_rn", row_number().over(wB))
      .where(col("_rn") <= maxBucket).drop("_rn")
    val q = bucketed(qv, "query_id", "qv")
    val candidates = c.join(broadcast(q), Seq("tbl", "bkt"))
      .where(col("corpus_id") =!= col("query_id"))
      .select("query_id", "corpus_id")
      .dropDuplicates("query_id", "corpus_id")
    val scored = candidates
      .join(cv, Seq("corpus_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("cv"), col("qv")).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path
    * alongside hyperplane LSH. Spherical k-means:
    *
    *  1. TRAIN: `nlist` centroids seeded from hash-picked corpus
    *     vectors (deterministic — no RNG), refined with `iters` Lloyd
    *     iterations. Assignment broadcasts the (tiny) centroid set;
    *     the update is one posexplode + groupBy(cluster, dim) mean per
    *     iteration — every step is a distributed pass, centroids
    *     (nlist × dim doubles) are the only driver-side state.
    *  2. INDEX: each corpus vector keys into its nearest centroid's
    *     inverted list.
    *  3. PROBE: a query scans only its `nProbe` nearest lists —
    *     corpus-scan fraction ≈ nProbe/nlist, the IVF trade.
    *
    * Returns the same (query_id, corpus_id, cos_sim, rank) shape as
    * the other ANN paths. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nProbe: Int = 4, iters: Int = 2,
      portableSeeds: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // native one-pass normalizer: the HOF transform's lambda inlined
    // the full l2norm fold PER ELEMENT — O(dim²) interpreted walks/row
    val unit = (v: Column) => graft.functions.VectorMath.unit(v)
    val cv = Similarity.spread(corpus).select(col(idCol).as("corpus_id"),
        col(vecCol).as("cv"), unit(col(vecCol)).as("cu"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def centDf(cents: Seq[(Int, Seq[Double])]): DataFrame = {
      val normed = cents.map { case (c, vec) =>
        val n = math.sqrt(vec.map(x => x * x).sum)
        (c, if (n > 0) vec.map(_ / n) else vec)
      }
      spark.createDataset(normed).toDF("cluster", "centroid")
    }
    def assign(df: DataFrame, idC: String, vecC: String,
        cents: DataFrame): DataFrame =
      df.crossJoin(broadcast(cents))
        .select(col(idC), col(vecC), col("cluster"),
          dot(col(vecC), col("centroid")).as("sim"))
        .groupBy(idC)
        .agg(max_by(col("cluster"), struct(col("sim"), -col("cluster"))).as("cluster"))

    // deterministic seeds: the nlist hash-minimal corpus vectors.
    // portableSeeds orders by md5 of the id string instead of Spark's
    // xxhash64, so an external oracle (q52) can pick the same seeds.
    val seedsOrdered =
      if (portableSeeds)
        cv.withColumn("__h", md5(col("corpus_id").cast("string")))
          .orderBy(col("__h"), col("corpus_id"))
      else cv.withColumn("__h", xxhash64(col("corpus_id"))).orderBy("__h")
    var centroids = centDf(
      seedsOrdered.limit(nlist)
        .collect().zipWithIndex
        .map { case (r, i) => i -> r.getSeq[Double](2) }.toSeq)
    (0 until iters).foreach { _ =>
      val assigned = assign(cv, "corpus_id", "cu", centroids)
      val means = cv.join(assigned, Seq("corpus_id"))
        .select(col("cluster"), posexplode(col("cu")))
        .groupBy("cluster", "pos").agg(avg("col").as("m"))
        .groupBy("cluster")
        .agg(map_from_arrays(collect_list("pos"), collect_list("m")).as("byPos"))
        .collect()
        .map { r =>
          val m = r.getMap[Int, Double](1)
          r.getInt(0) -> (0 until m.keys.max + 1).map(m.getOrElse(_, 0.0))
        }.toSeq
      if (means.nonEmpty) centroids = centDf(means)
    }

    // inverted index: cluster → member vectors
    val index = cv.join(assign(cv, "corpus_id", "cu", centroids), Seq("corpus_id"))
    // probe: each query ranks the centroids, keeps nProbe lists
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      unit(col(vecCol)).as("qu"))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("cluster").asc)
    val probed = qv.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cluster"),
        dot(col("qu"), col("centroid")).as("sim"))
      .withColumn("__r", row_number().over(wq)).where(col("__r") <= nProbe)
      .select("query_id", "qv", "cluster")
    val scored = index.join(broadcast(probed), Seq("cluster"))
      .where(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("cv"), col("qv")).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("corpus_id").asc)
    Similarity.materializeAndRelease(
      scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k),
      cv)
  }

  /** IVF ANN with INTEGER-EXACT Lloyd refinement — the engine-portable
    * twin of [[ivfTopK]] that an external SQL oracle can recompute
    * bit-for-bit, k-means iterations INCLUDED (q47; [[ivfTopK]]'s float
    * spherical k-means stays the engine-internal path, its seed/probe
    * semantics pinned by q52 at iters=0):
    *
    *  - vectors are L2-normalized then QUANTIZED to round(u*1000)
    *    longs, so every Lloyd quantity is integer arithmetic;
    *  - a centroid is kept as its members' (elementwise long sum S,
    *    count c) — never divided — and assignment minimizes the exact
    *    squared Euclidean distance to the mean S/c:
    *    cost = (c²·‖q‖² − 2c·⟨q,S⟩ + ‖S‖²) / c². Every numerator term
    *    is bounded by ~2·dim·quant²·c² (dim 64, quant 1e3 ⇒ 1.3e8·c²),
    *    so exactness in IEEE doubles (< 2^53) holds while the LARGEST
    *    CLUSTER stays ≤ ~8,000 members — enforced at run time below.
    *    Inside that bound the one double division is identical in
    *    every engine (no FP-summation-order hazard anywhere); beyond
    *    it, use [[ivfTopK]] — this twin exists to be recomputable by
    *    an external SQL oracle on bounded verification slices, exactly
    *    like the other parity forms (q50/q51/q52 inputs);
    *  - seeds are the `nlist` md5-minimal corpus vectors (count 1), as
    *    in [[ivfTopK]]'s portableSeeds mode; ties break on cluster id;
    *  - probing ranks the final centroids by the same exact metric;
    *    final scoring is exact cosine over the ORIGINAL vectors.
    *
    * Same distributed shape as [[ivfTopK]]: assignment broadcasts the
    * tiny centroid set, the sum-update is one posexplode + groupBy pass
    * per iteration, driver state is O(nlist×dim) longs. */
  def ivfTopKPortable(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // native one-pass normalize+quantize and exact long dot (HOF forms
    // ran interpreted — the normalizer at O(dim²) walks per row); fold
    // order and the round() rule are unchanged (VectorMathSpec)
    val quantUnit = (v: Column) => graft.functions.VectorMath.unitQuant(v)
    val dotL = (a: Column, b: Column) => graft.functions.VectorMath.dotLong(a, b)
    val cv = Similarity.spread(corpus)
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
        quantUnit(col(vecCol)).as("qz"))
      .withColumn("qq", dotL(col("qz"), col("qz")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // centroid state: (cluster, S = elementwise member sum, c = count).
    // The exactness envelope (every cost term < 2^53, see doc) needs
    // max cluster size ≤ ~8k at dim 64 / quant 1e3 — refuse loudly
    // rather than let Spark-vs-oracle parity decay silently
    def centDf(cents: Seq[(Int, Seq[Long], Long)]): DataFrame = {
      val cMax = cents.map(_._3).max
      require(cMax <= 8000L,
        s"ivfTopKPortable: a cluster holds $cMax members — beyond the " +
          "integer-exactness envelope (~8k at dim 64, quant 1e3); use " +
          "ivfTopK for corpora of this shape")
      spark.createDataset(cents).toDF("cluster", "S", "c")
        .withColumn("ss", dotL(col("S"), col("S")))
    }
    // exact-integer cost, one deterministic double division at the end
    def cost: Column =
      (col("c") * col("c") * col("qq") - lit(2L) * col("c") * dotL(col("qz"), col("S"))
        + col("ss")).cast("double") / (col("c") * col("c")).cast("double")
    def assign(df: DataFrame, idC: String, cents: DataFrame): DataFrame =
      df.crossJoin(broadcast(cents))
        .select(col(idC), col("cluster"), cost.as("_cost"))
        .groupBy(idC)
        .agg(min_by(col("cluster"), struct(col("_cost"), col("cluster"))).as("cluster"))

    var centroids = centDf(
      cv.withColumn("__h", md5(col("corpus_id").cast("string")))
        .orderBy(col("__h"), col("corpus_id")).limit(nlist)
        .select("qz").collect().zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Long](0), 1L) }.toSeq)
    (0 until iters).foreach { _ =>
      val assigned = assign(cv, "corpus_id", centroids)
      val sums = cv.join(assigned, Seq("corpus_id"))
        .select(col("cluster"), posexplode(col("qz")))
        .groupBy("cluster", "pos").agg(sum("col").as("s"), count(lit(1)).as("c"))
        .groupBy("cluster")
        .agg(map_from_arrays(collect_list("pos"), collect_list("s")).as("byPos"),
          first("c").as("c"))
        .collect()
        .map { r =>
          val m = r.getMap[Int, Long](1)
          (r.getInt(0), (0 until m.keys.max + 1).map(m.getOrElse(_, 0L)).toSeq,
            r.getLong(2))
        }.toSeq
      if (sums.nonEmpty) centroids = centDf(sums)
    }

    val index = cv.join(assign(cv, "corpus_id", centroids), Seq("corpus_id"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        quantUnit(col(vecCol)).as("qz"))
      .withColumn("qq", dotL(col("qz"), col("qz")))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("_cost").asc, col("cluster").asc)
    val probed = qv.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cluster"), cost.as("_cost"))
      .withColumn("__r", row_number().over(wq)).where(col("__r") <= nProbe)
      .select("query_id", "qv", "cluster")
    val scored = index.join(broadcast(probed), Seq("cluster"))
      .where(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("cv"), col("qv")).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("corpus_id").asc)
    Similarity.materializeAndRelease(
      scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k),
      cv)
  }

  /** Symmetric near-duplicate search over ONE corpus — the self-join
    * form. Never broadcasts: the candidate join is a shuffle join on
    * (tbl, bkt) carrying ids only, each bucket capped at `maxBucket`
    * rows (id-hash eviction order, so no id range is preferentially
    * evicted), vectors and norms re-joined exactly once for scoring.
    * At high `minCosine` use many planes (≥12) so buckets stay small:
    * collision prob per table for angle θ is (1-θ/π)^planes, and near-
    * identical pairs (θ≈0) still collide in some table with probability
    * ≈ 1-(1-p^planes)^tables.
    *
    * Scale shape: bucketing is one narrow pass; the only quadratic
    * term is per-(tbl,bkt) and hard-capped; norms are precomputed per
    * row (not per pair). This replaces the corpus-wide broadcast that
    * made the previous embedding near-dup path die at scale. */
  def lshNearDups(
      corpus: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, planes: Int = 12, tables: Int = 12,
      maxBucket: Int = 64): DataFrame = {
    val v = Similarity.spread(corpus).select(col(idCol).as("_id"),
        transform(col(vecCol), _.cast("double")).as("_v"))
      .withColumn("_n", l2norm(col("_v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bucketed = v.select(col("_id"),
        explode(lshBuckets(col("_v"), planes, tables)).as("b"))
      .select(col("_id"), col("b.tbl"), col("b.bkt"))
    val wB = Window.partitionBy("tbl", "bkt").orderBy(xxhash64(col("_id")))
    val capped = bucketed.withColumn("_rn", row_number().over(wB))
      .where(col("_rn") <= maxBucket).drop("_rn")
    val l = capped.select(col("tbl"), col("bkt"), col("_id").as("id_a"))
    val r = capped.select(col("tbl"), col("bkt"), col("_id").as("id_b"))
    val candidates = l.join(r, Seq("tbl", "bkt"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    Similarity.materializeAndRelease(
      candidates
        .join(v.select(col("_id").as("id_a"), col("_v").as("va"), col("_n").as("na")),
          Seq("id_a"))
        .join(v.select(col("_id").as("id_b"), col("_v").as("vb"), col("_n").as("nb")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos_sim"))
        .where(col("cos_sim") >= minCosine),
      v)
  }
}
