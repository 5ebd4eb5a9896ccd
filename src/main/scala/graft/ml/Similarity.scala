package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection and similarity search for training-data
  * pipelines: word-shingle MinHash + LSH banding, SimHash, and
  * signature-based Jaccard verification.
  *
  * Everything is built from codegen'd column expressions (higher-order
  * array functions + xxhash64) — no UDFs, no driver loops. The
  * embarrassingly-parallel parts (signatures) are per-row; the only
  * shuffles are the LSH bucket groupBys, which is the point of LSH:
  * candidate generation cost scales with bucket sizes, not n².
  */
object Similarity {

  /** Deterministic cache lifecycle for the near-dup operators: the
    * candidate-pair RESULT (small — bounded by bucket caps) is
    * materialized once into its own cache, after which the heavy
    * per-document intermediates (shingle/signature/vector frames, which
    * would otherwise stay pinned on disk until session end) are
    * released. The persisted result must outlive this call (the
    * intermediates it derives from are gone), so its — small, capped —
    * cache blocks are retained for the session; callers that invoke an
    * operator many times in one long-lived session own that trade and
    * may unpersist each result after consuming it. What this fixes is
    * the UNBOUNDED case: the heavy O(corpus) intermediates no longer
    * accumulate per invocation. */
  private[ml] def materializeAndRelease(
      result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try out.count()
    finally intermediates.foreach(_.unpersist())
    out
  }

  /** Spread a tiny (few-split) input across the session's cores before
    * compute-heavy per-row work: a sub-`maxPartitionBytes` corpus file
    * scans as ONE partition, so the signature/shingle/quantize
    * pipelines — the dominant per-row cost of every near-dup/ANN
    * operator — serialize on a single core while the rest idle
    * (measured: the whole 5 s shingle+MinHash pass of q30 at sf0.1 ran
    * as one task; guide §2.5 "input skew... repartition immediately
    * after the read"). No-op when the scan already has enough splits
    * (the 100 TB case — inputs arrive in many file splits, so the
    * exchange never fires at scale). Row placement is semantically
    * irrelevant: every downstream operator keys on content, and the
    * bucket-cap eviction orders are content-hash-based. */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // estimate the scan's split count from file metadata instead of
    // df.rdd.getNumPartitions: under AQE, building the RDD EXECUTES
    // every intermediate query stage of a non-scan-shaped input (and
    // always pays a discarded physical-planning pass). inputFiles is a
    // driver-side walk of the already-built file index; each file is
    // at least one split, plus one per maxPartitionBytes of it.
    val files = try df.inputFiles catch { case _: Throwable => Array.empty[String] }
    if (files.isEmpty || files.length * 2 >= p) return df
    val maxSplit = math.max(1L,
      df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
    val totalBytes = files.map { f =>
      try java.nio.file.Files.size(
        java.nio.file.Paths.get(new java.net.URI(f).getPath))
      catch { case _: Throwable => maxSplit } // unknown size: assume a full split
    }.sum
    val estSplits = math.max(files.length.toLong,
      (totalBytes + maxSplit - 1) / maxSplit)
    if (estSplits * 2 >= p) df else df.repartition(p)
  }

  /** Word n-gram shingles of a text column (distinct). Runs as the
    * native codegen'd [[graft.functions.ShinglesExpr]] — the previous
    * higher-order-function formulation (transform + slice + concat_ws
    * + filter + array_distinct) evaluated interpreted at ~|tokens|
    * expression-tree walks per row and was the single largest job of
    * the q30/q32 bench wall; values are identical per row
    * (ShinglesSpec asserts equality against the HOF form, whitespace
    * edge cases included). */
  def shingles(text: Column, n: Int): Column =
    graft.functions.ShinglesExpr.shingles(text, n)

  /** The pre-round-6 HOF formulation, kept as the equivalence oracle
    * for ShinglesSpec (never on a hot path). */
  private[graft] def shinglesHof(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    array_distinct(filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
      s => length(s) > 0))
  }

  /** MinHash signature: each shingle is string-hashed ONCE, then the k
    * independent hash functions are derived by re-hashing the base long
    * (universal-hashing trick) — one pass over the shingle array, k
    * cheap long-hashes per shingle instead of k string-hashes. Runs as
    * the native codegen'd [[graft.functions.MinHashSigExpr]] (the HOF
    * formulation evaluated interpreted at ~|shingles|×k tree-walks per
    * row); hash values are bit-identical to the previous column form. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    graft.functions.MinHashSigExpr.minhashSig(shingleCol, k)

  /** Estimated Jaccard from two equal-length MinHash signatures. */
  def signatureJaccard(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(a).cast("double")

  /** LSH banding: split a k-entry signature into `bands` bands and hash
    * each band. Rows sharing any (band_idx, band_hash) are candidates. */
  def lshBands(sig: Column, k: Int, bands: Int): Column = {
    val rowsPerBand = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(concat_ws(",",
          slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))), b).as("bucket")))
  }

  /** Candidate near-dup pairs via MinHash+LSH, verified by signature
    * Jaccard ≥ threshold. Returns (id_a, id_b, est_jaccard), id_a<id_b.
    *
    * Scale shape: signatures are one narrow pass; the band explode
    * multiplies rows by `bands` (small constant); the self-join runs
    * per-bucket. Hot buckets (boilerplate shingles) are capped via
    * `maxBucket` to bound the quadratic blowup, like production dedup
    * pipelines do.
    */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, maxBucket: Int = 64): DataFrame = {
    val sigs = spread(df).select(col(idCol).as("_id"),
        shingles(col(textCol), shingleN).as("_shg"))
      .where(size(col("_shg")) > 0) // empty docs must not share a signature
      .select(col("_id"), minhashSignature(col("_shg"), k).as("_sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate generation carries ONLY ids through the band join —
    // signatures would multiply the shuffle k-fold
    val banded = sigs.select(col("_id"),
        explode(lshBands(col("_sig"), k, bands)).as("b"))
      .select(col("_id"), col("b.band"), col("b.bucket"))
    // cap pathological buckets (constant-prefix shingle floods);
    // id-HASH eviction order, not id order — systematically high ids
    // (e.g. planted mutants at doc_id+100000) must not be evicted first
    val wB = Window.partitionBy("band", "bucket").orderBy(xxhash64(col("_id")))
    val capped = banded.withColumn("_rn", row_number().over(wB))
      .where(col("_rn") <= maxBucket).drop("_rn")
    val l = capped.select(col("band"), col("bucket"), col("_id").as("id_a"))
    val r = capped.select(col("band"), col("bucket"), col("_id").as("id_b"))
    // each surviving pair scored ONCE, however many bands it collides in
    val candidates = l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    materializeAndRelease(
      candidates
        .join(sigs.select(col("_id").as("id_a"), col("_sig").as("sig_a")), Seq("id_a"))
        .join(sigs.select(col("_id").as("id_b"), col("_sig").as("sig_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          signatureJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
        .where(col("est_jaccard") >= threshold),
      sigs)
  }

  /** 64-bit SimHash of a whitespace-tokenized text column — fully
    * per-row (no shuffle). Implemented as a native Catalyst expression
    * ([[graft.functions.SimHash64Expr]]): the previous higher-order-
    * function formulation ran interpreted (HOFs are CodegenFallback) at
    * ~64 expression-tree evaluations per token; the native loop is a
    * per-byte scan with codegen. */
  def simhash64(text: Column): Column =
    graft.functions.SimHash64Expr.simhash64(text)

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** A 60-bit SimHash whose per-token hash is the first 15 hex digits
    * of md5 — bit-for-bit reproducible by any engine with md5 (the
    * DuckDB oracle for q50 recomputes it in SQL), unlike the default
    * [[simhash64]] whose XXH64 token hash is Spark-internal. A native
    * codegen'd expression ([[graft.functions.Md5SimHash60Expr]]): the
    * HOF formulation (aggregate over a 60-wide vote array) ran
    * interpreted at ~30 s over sf0.1's documents; the native loop is
    * ~50× faster. */
  def md5SimHash60(text: Column): Column =
    graft.functions.Md5SimHash60Expr.md5SimHash60(text)

  /** SimHash near-dup pairs: block on 8-bit chunks — by pigeonhole, a
    * pair within hamming ≤ 7 of 64 bits must agree on at least one of
    * the 8 chunks — then verify exact hamming. (Short documents flip
    * several bits per edit, so the hamming budget must be generous;
    * 16-bit chunks would only guarantee ≤ 3.)
    *
    * `maxBucket` caps each (chunk, key) block — 8-bit chunks give only
    * 256 blocks per chunk, so without a cap a large corpus degenerates
    * to an O(n²/256) candidate join. Capping trades bounded recall loss
    * for a hard bound on the blow-up (a pair inside the hamming budget
    * collides on several chunks, so eviction from one hot block rarely
    * loses it). Eviction order is id-hash, not id, so systematically
    * high ids (e.g. planted mutants) aren't preferentially evicted.
    *
    * With `maxBucket` effectively unbounded the pigeonhole guarantee
    * makes the output EXACTLY the exhaustive all-pairs answer at
    * `maxHamming` ≤ 7 — q50 exploits that with the md5 fingerprint to
    * hash-match a DuckDB oracle. `fingerprint` swaps the simhash
    * implementation (default: the native XXH64 expression) and `evict`
    * swaps the bucket-cap eviction key (default: Spark-internal
    * xxhash64; q31 passes md5-of-id so an external oracle reproduces
    * the CAPPED path bit-for-bit, eviction included). */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 7, maxBucket: Int = 128,
      fingerprint: Column => Column = simhash64,
      evict: Column => Column = xxhash64(_)): DataFrame = {
    val hashed = spread(df)
      .select(col(idCol).as("_id"), fingerprint(col(textCol)).as("_sh"))
    val chunked = hashed.select(col("_id"),
        explode(transform(sequence(lit(0), lit(7)),
          c => struct(c.as("chunk"),
            call_function("shiftright", col("_sh"), c * 8).bitwiseAND(0xFFL).as("key")))).as("b"))
      .select(col("_id"), col("b.chunk"), col("b.key"))
    // the id tiebreak makes eviction deterministic even under (however
    // unlikely) eviction-key collisions
    val wB = Window.partitionBy("chunk", "key")
      .orderBy(evict(col("_id")), col("_id"))
    val capped = chunked.withColumn("_rn", row_number().over(wB))
      .where(col("_rn") <= maxBucket).drop("_rn")
    val l = capped.select(col("chunk"), col("key"), col("_id").as("id_a"))
    val r = capped.select(col("chunk"), col("key"), col("_id").as("id_b"))
    val candidates = l.join(r, Seq("chunk", "key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candidates
      .join(hashed.select(col("_id").as("id_a"), col("_sh").as("sh_a")), Seq("id_a"))
      .join(hashed.select(col("_id").as("id_b"), col("_sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard for a (small) candidate pair set: joins the
    * shingle sets back and computes |A∩B| / |A∪B| exactly. */
  def exactJaccard(
      df: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("_id"),
      shingles(col(textCol), shingleN).as("_sh"))
    pairs
      .join(sh.select(col("_id").as("id_a"), col("_sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("_id").as("id_b"), col("_sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
  }

  /** LSH-candidate generation + EXACT Jaccard verification in ONE
    * shingle pass: shingles are computed once and persisted, signatures
    * and the banding join derive from them, candidate ids re-join the
    * same persisted shingles for the exact intersection/union counts.
    * (The previous two-operator composition recomputed shingles and
    * signatures from scratch for the verify stage — 2× the dominant
    * per-row cost.)
    *
    * Output is integer-exact — (id_a, id_b, n_inter, n_union) with
    * n_inter/n_union ≥ `threshold` — so an oracle can reproduce it
    * bit-for-bit with no float rounding at the threshold boundary.
    * With `bands = 32` (2 rows/band) a pair at Jaccard j is missed with
    * probability (1-j²)^32 — ≤ 4e-10 at j = 0.7 — so on corpora whose
    * true near-dups sit well above the threshold the LSH output equals
    * the exhaustive O(n²) answer, which is exactly what the driver
    * oracle computes.
    */
  def exactNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 32,
      threshold: (Int, Int) = (7, 10), maxBucket: Int = 64): DataFrame = {
    val (num, den) = threshold
    val sh = spread(df).select(col(idCol).as("_id"),
        shingles(col(textCol), shingleN).as("_shg"))
      .where(size(col("_shg")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = sh.select(col("_id"), minhashSignature(col("_shg"), k).as("_sig"))
    val banded = sigs.select(col("_id"),
        explode(lshBands(col("_sig"), k, bands)).as("b"))
      .select(col("_id"), col("b.band"), col("b.bucket"))
    // id-hash eviction order: identical docs flood every band bucket,
    // and hash order keeps eviction unbiased w.r.t. id ranges
    val wB = Window.partitionBy("band", "bucket").orderBy(xxhash64(col("_id")))
    val capped = banded.withColumn("_rn", row_number().over(wB))
      .where(col("_rn") <= maxBucket).drop("_rn")
    val l = capped.select(col("band"), col("bucket"), col("_id").as("id_a"))
    val r = capped.select(col("band"), col("bucket"), col("_id").as("id_b"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    materializeAndRelease(
      candidates
        .join(sh.select(col("_id").as("id_a"), col("_shg").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("_id").as("id_b"), col("_shg").as("sh_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("sh_a"), col("sh_b"))).as("n_inter"),
          size(array_union(col("sh_a"), col("sh_b"))).as("n_union"))
        .where(col("n_inter") * den >= col("n_union") * num),
      sh)
  }
}
