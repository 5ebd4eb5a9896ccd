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

  /** Word n-gram shingles of a text column (distinct). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    array_distinct(filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
      s => length(s) > 0))
  }

  /** MinHash signature: k independent hash functions via seeded
    * xxhash64; entry j = min over shingles of h_j(shingle). */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(shingleCol, s => xxhash64(j, s))))

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
    val sigs = df.select(col(idCol).as("_id"),
        minhashSignature(shingles(col(textCol), shingleN), k).as("_sig"))
      .where(size(col("_sig")) > 0)
    val banded = sigs.select(col("_id"), col("_sig"),
        explode(lshBands(col("_sig"), k, bands)).as("b"))
      .select(col("_id"), col("_sig"), col("b.band"), col("b.bucket"))
    // cap pathological buckets (constant-prefix shingle floods)
    val wB = Window.partitionBy("band", "bucket").orderBy("_id")
    val capped = banded.withColumn("_rn", row_number().over(wB))
      .where(col("_rn") <= maxBucket).drop("_rn")
    val l = capped.select(col("band"), col("bucket"),
      col("_id").as("id_a"), col("_sig").as("sig_a"))
    val r = capped.select(col("band"), col("bucket"),
      col("_id").as("id_b"), col("_sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        signatureJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
      .groupBy("id_a", "id_b").agg(max("est_jaccard").as("est_jaccard"))
  }

  /** 64-bit SimHash of a token array — fully per-row (no shuffle):
    * each token's xxhash64 votes ±1 per bit; the sign vector packs
    * into one long. */
  def simhash64(text: Column): Column = {
    val toks = split(text, " ")
    val votes = aggregate(
      toks,
      transform(sequence(lit(0), lit(63)), _ => lit(0L)),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => a + when(call_function("shiftright", h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 8-bit chunks — by pigeonhole, a
    * pair within hamming ≤ 7 of 64 bits must agree on at least one of
    * the 8 chunks — then verify exact hamming. (Short documents flip
    * several bits per edit, so the hamming budget must be generous;
    * 16-bit chunks would only guarantee ≤ 3.) */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 7): DataFrame = {
    val hashed = df.select(col(idCol).as("_id"), simhash64(col(textCol)).as("_sh"))
    val chunked = hashed.select(col("_id"), col("_sh"),
        explode(transform(sequence(lit(0), lit(7)),
          c => struct(c.as("chunk"),
            call_function("shiftright", col("_sh"), c * 8).bitwiseAND(0xFFL).as("key")))).as("b"))
      .select(col("_id"), col("_sh"), col("b.chunk"), col("b.key"))
    val l = chunked.select(col("chunk"), col("key"), col("_id").as("id_a"), col("_sh").as("sh_a"))
    val r = chunked.select(col("chunk"), col("key"), col("_id").as("id_b"), col("_sh").as("sh_b"))
    l.join(r, Seq("chunk", "key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
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
}
