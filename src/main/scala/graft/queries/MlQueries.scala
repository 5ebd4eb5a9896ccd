package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{Multimodal, Similarity, Vectors}

/** Training-data pipeline operators as driver queries: near-dup
  * detection (MinHash+LSH, SimHash, exact n-gram Jaccard), embedding
  * similarity search (brute-force + LSH), multimodal binary plumbing.
  *
  * The synthetic documents have no organic near-dups, so the dedup
  * queries run over `withMutants`: the corpus unioned with
  * deterministically mutated copies (one appended token) — every
  * mutant pair (id, id+100000) is a known near-dup the operators must
  * find. Every query carries a DuckDB oracle: the probabilistic
  * operators run with engine-portable md5 fingerprints / bucketing /
  * eviction keys on the query surface (Spark-internal xxhash64 stays
  * the engine fast path), so the oracles recompute candidate
  * generation, bucket caps and verification from scratch; MlSpec
  * additionally property-tests the xxhash64 forms structurally.
  */
object MlQueries {
  import Tables.t

  val MutantOffset = 100000L

  def withMutants(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + MutantOffset).as("doc_id"),
        concat(col("text"), lit(" mutated")).as("text")))

  val defs: Seq[QueryDef] = Seq(
    // MinHash+LSH near-dups. The driver-checked projection is the PAIR
    // SET: the corpus' true near-dups (planted mutants) sit at Jaccard
    // ≈ 0.95 and everything else near 0, so the k=64 signature estimate
    // (σ ≈ 0.06) and the exact Jaccard agree on which side of 0.5 every
    // pair falls — the exhaustive O(n²) exact-Jaccard oracle must equal
    // the LSH output. The estimate VALUES are signature-dependent (not
    // SQL-reproducible); their accuracy is property-tested in MlSpec.
    QueryDef("q30_minhash_lsh_neardups",
      (s, d) => Similarity.minhashNearDups(
        withMutants(t(s, d, "documents")), "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.5)
        .select("id_a", "id_b"),
      Some("""WITH d AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text || ' mutated' AS text FROM documents
        ), sh AS (
          SELECT doc_id, shg FROM (
            SELECT doc_id, list_filter(list_distinct(list_transform(
              range(1, greatest(len(toks) - 2, 1) + 1),
              i -> array_to_string(toks[i:i+2], ' '))), s -> s <> '') AS shg
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM d))
          WHERE len(shg) > 0
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_distinct(list_intersect(a.shg, b.shg))) * 2
          >= len(list_distinct(a.shg || b.shg))""")),

    // SimHash near-dups — the PRODUCTION shape (8×8-bit pigeonhole
    // blocking, maxBucket=128 cap with hash-ordered eviction), oracled
    // end to end: the query surface defaults to the portable md5
    // fingerprint and md5-of-id eviction key, so the DuckDB oracle
    // recomputes fingerprints, chunk blocking, the CAP ITSELF (same
    // row_number-over-eviction-key semantics) and the hamming verify
    // from scratch. The XXH64 fingerprint stays available as the
    // engine-internal fast path (Similarity.simhash64 default).
    QueryDef("q31_simhash_neardups",
      (s, d) => Similarity.simhashNearDups(
        withMutants(t(s, d, "documents")), "doc_id", "text", maxHamming = 7,
        fingerprint = Similarity.md5SimHash60,
        evict = c => md5(c.cast("string"))),
      Some("""WITH d AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text || ' mutated' AS text FROM documents
        ), th AS (
          SELECT doc_id, CAST(concat('0x', substr(md5(tk), 1, 15)) AS BIGINT) AS h
          FROM (SELECT doc_id,
                  unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
                FROM d)
        ), bits AS (
          SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM th, (SELECT unnest(range(60)) AS b) GROUP BY doc_id, b
        ), fp AS (
          SELECT d.doc_id,
            CAST(coalesce(sum(CASE WHEN bits.v > 0 THEN (1::BIGINT << bits.b) ELSE 0 END), 0) AS BIGINT) AS f
          FROM d LEFT JOIN bits ON d.doc_id = bits.doc_id GROUP BY d.doc_id
        ), ch AS (
          SELECT doc_id, c AS chunk, (f >> (c * 8)) & 255 AS key
          FROM fp, (SELECT unnest(range(8)) AS c)
        ), capped AS (
          SELECT doc_id, chunk, key FROM (
            SELECT doc_id, chunk, key, row_number() OVER (
                PARTITION BY chunk, key
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM ch) WHERE rn <= 128
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM capped a JOIN capped b ON a.chunk = b.chunk AND a.key = b.key
          WHERE a.doc_id < b.doc_id
        )
        SELECT c.id_a, c.id_b,
          CAST(bit_count(xor(fa.f, fb.f)) AS INTEGER) AS hamming
        FROM cand c
        JOIN fp fa ON fa.doc_id = c.id_a
        JOIN fp fb ON fb.doc_id = c.id_b
        WHERE bit_count(xor(fa.f, fb.f)) <= 7""")),

    // SimHash EXHAUSTIVE parity: same banding+verify operator, but (a)
    // the bucket cap is lifted, so the 8×8-bit pigeonhole guarantee
    // makes the banded output EXACTLY the all-pairs answer at hamming
    // ≤ 7, and (b) the fingerprint's per-token hash is an md5 prefix,
    // which DuckDB recomputes bit-for-bit in SQL — so the probabilistic
    // operator's candidate generation + verification is hash-matched
    // against an engine-independent exhaustive oracle. q31 runs the
    // CAPPED form of the same operator (same md5 fingerprint since
    // round 5; the XXH64 fast path keeps MlSpec structural coverage).
    // Like every exhaustive-parity check (q30/q32 oracles), the input
    // is a bounded slice — uncapped all-pairs on an unbounded corpus is
    // exactly what the production form exists to avoid.
    QueryDef("q50_simhash_exhaustive",
      (s, d) => Similarity.simhashNearDups(
        withMutants(t(s, d, "documents").where(col("doc_id") < 500)),
        "doc_id", "text",
        maxHamming = 7, maxBucket = Int.MaxValue,
        fingerprint = Similarity.md5SimHash60),
      Some("""WITH d AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 500
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text || ' mutated' AS text
          FROM documents WHERE doc_id < 500
        ), th AS (
          SELECT doc_id, CAST(concat('0x', substr(md5(tk), 1, 15)) AS BIGINT) AS h
          FROM (SELECT doc_id,
                  unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
                FROM d)
        ), bits AS (
          SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM th, (SELECT unnest(range(60)) AS b) GROUP BY doc_id, b
        ), fp AS (
          SELECT d.doc_id,
            CAST(coalesce(sum(CASE WHEN bits.v > 0 THEN (1::BIGINT << bits.b) ELSE 0 END), 0) AS BIGINT) AS f
          FROM d LEFT JOIN bits ON d.doc_id = bits.doc_id GROUP BY d.doc_id
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.f, b.f)) <= 7""")),

    // LSH candidates + exact Jaccard verify, single shingle pass. The
    // oracle is the EXHAUSTIVE all-pairs exact Jaccard at the same
    // integer threshold (7/10): with bands=32 the LSH miss probability
    // at j ≥ 0.7 is ≤ 4e-10 per pair, so the capped-LSH output equals
    // the O(n²) answer — the strongest check a probabilistic candidate
    // generator can pass. Output columns are exact ints (no float
    // rounding at the threshold boundary).
    QueryDef("q32_exact_jaccard_verify",
      (s, d) => Similarity.exactNearDups(
        withMutants(t(s, d, "documents")), "doc_id", "text",
        shingleN = 3, k = 64, bands = 32, threshold = (7, 10)),
      Some("""WITH d AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text || ' mutated' AS text FROM documents
        ), sh AS (
          SELECT doc_id, shg FROM (
            SELECT doc_id, list_filter(list_distinct(list_transform(
              range(1, greatest(len(toks) - 2, 1) + 1),
              i -> array_to_string(toks[i:i+2], ' '))), s -> s <> '') AS shg
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM d))
          WHERE len(shg) > 0
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_distinct(list_intersect(a.shg, b.shg))) AS INTEGER) AS n_inter,
          CAST(len(list_distinct(a.shg || b.shg)) AS INTEGER) AS n_union
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_distinct(list_intersect(a.shg, b.shg))) * 10
          >= len(list_distinct(a.shg || b.shg)) * 7""")),

    // brute-force cosine top-k — exact baseline, DuckDB-checkable
    // (both engines left-fold the same doubles in the same order)
    QueryDef("q33_ann_bruteforce",
      (s, d) => {
        val e = t(s, d, "embeddings")
        Vectors.bruteForceTopK(e, e.where(col("vec_id") < 3),
            "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("corpus_id"), col("rank"),
            round(col("cos_sim"), 6).as("cos_sim_r"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
        scored AS (SELECT query_id, vec_id AS corpus_id,
          list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS cos_sim
          FROM e, q WHERE vec_id <> query_id),
        ranked AS (SELECT query_id, corpus_id, cos_sim,
          row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id ASC) AS rank
          FROM scored)
        SELECT query_id, corpus_id, rank, round(cos_sim, 6) AS cos_sim_r
        FROM ranked WHERE rank <= 5""")),

    // LSH ANN PARITY: the same lshTopK operator, with (a) plane signs
    // derived from md5("t:p:i") instead of Spark-internal xxhash64,
    // (b) projections over round(x*1000)-quantized longs so the sign
    // decision is integer-exact in both engines, and (c) the bucket cap
    // lifted — so the DuckDB oracle recomputes the buckets, the
    // any-table candidate union, the exact cosine scoring and the
    // ranking from scratch. This oracles the ANN pipeline end to end;
    // q34 keeps the production (xxhash64, capped) form.
    QueryDef("q51_ann_lsh_parity",
      (s, d) => {
        val e = t(s, d, "embeddings")
        Vectors.lshTopK(e, e.where(col("vec_id") < 3),
            "vec_id", "embedding", k = 5, planes = 4, tables = 8,
            maxBucket = Int.MaxValue,
            bucketer = Vectors.lshBucketsPortable(_, 4, 8))
          .select(col("query_id"), col("corpus_id"), col("rank"),
            round(col("cos_sim"), 6).as("cos_sim_r"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        z AS (SELECT vec_id, list_transform(v, x -> CAST(round(x*1000) AS BIGINT)) AS zv FROM e),
        dims AS (SELECT unnest(range(64)) AS i),
        tp AS (SELECT t, p FROM (SELECT unnest(range(8)) AS t), (SELECT unnest(range(4)) AS p)),
        sgn AS (SELECT t, p, i,
            CASE WHEN CAST(concat('0x', substr(md5(t || ':' || p || ':' || i), 1, 1)) AS INTEGER) % 2 = 0
              THEN 1 ELSE -1 END AS s
          FROM tp, dims),
        proj AS (SELECT z.vec_id, g.t, g.p, sum(z.zv[g.i + 1] * g.s) AS pr
          FROM z, sgn g GROUP BY z.vec_id, g.t, g.p),
        buck AS (SELECT vec_id, t,
            sum(CASE WHEN pr >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS bkt
          FROM proj GROUP BY vec_id, t),
        cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id
          FROM buck q JOIN buck c ON q.t = c.t AND q.bkt = c.bkt
          WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id),
        scored AS (SELECT query_id, corpus_id,
            list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos_sim
          FROM cand
          JOIN e a ON a.vec_id = corpus_id
          JOIN e b ON b.vec_id = query_id),
        ranked AS (SELECT query_id, corpus_id, cos_sim,
            row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id ASC) AS rank
          FROM scored)
        SELECT query_id, corpus_id, rank, round(cos_sim, 6) AS cos_sim_r
        FROM ranked WHERE rank <= 5""")),

    // LSH-bucketed ANN — the scale path, oracled WITH its bucket cap:
    // the query surface defaults to the portable md5-sign bucketer and
    // md5-of-id eviction, so the DuckDB oracle recomputes bucketing,
    // the per-(table,bucket) corpus cap (row_number over the same
    // eviction key; query side uncapped, exactly as the operator), the
    // candidate union, exact cosine and ranking. q51 keeps the
    // uncapped parity form; the xxhash64 bucketer remains the
    // engine-internal fast path (lshBuckets default).
    QueryDef("q34_ann_lsh",
      (s, d) => {
        val e = t(s, d, "embeddings")
        Vectors.lshTopK(e, e.where(col("vec_id") < 3),
            "vec_id", "embedding", k = 5, planes = 4, tables = 8,
            bucketer = Vectors.lshBucketsPortable(_, 4, 8),
            evict = c => md5(c.cast("string")))
          .select(col("query_id"), col("corpus_id"), col("rank"),
            round(col("cos_sim"), 6).as("cos_sim_r"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        z AS (SELECT vec_id, list_transform(v, x -> CAST(round(x*1000) AS BIGINT)) AS zv FROM e),
        dims AS (SELECT unnest(range(64)) AS i),
        tp AS (SELECT t, p FROM (SELECT unnest(range(8)) AS t), (SELECT unnest(range(4)) AS p)),
        sgn AS (SELECT t, p, i,
            CASE WHEN CAST(concat('0x', substr(md5(t || ':' || p || ':' || i), 1, 1)) AS INTEGER) % 2 = 0
              THEN 1 ELSE -1 END AS s
          FROM tp, dims),
        proj AS (SELECT z.vec_id, g.t, g.p, sum(z.zv[g.i + 1] * g.s) AS pr
          FROM z, sgn g GROUP BY z.vec_id, g.t, g.p),
        buck AS (SELECT vec_id, t,
            sum(CASE WHEN pr >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS bkt
          FROM proj GROUP BY vec_id, t),
        capped AS (SELECT vec_id, t, bkt FROM (
            SELECT vec_id, t, bkt, row_number() OVER (
                PARTITION BY t, bkt
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
            FROM buck) WHERE rn <= 1024),
        cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id
          FROM buck q JOIN capped c ON q.t = c.t AND q.bkt = c.bkt
          WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id),
        scored AS (SELECT query_id, corpus_id,
            list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos_sim
          FROM cand
          JOIN e a ON a.vec_id = corpus_id
          JOIN e b ON b.vec_id = query_id),
        ranked AS (SELECT query_id, corpus_id, cos_sim,
            row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id ASC) AS rank
          FROM scored)
        SELECT query_id, corpus_id, rank, round(cos_sim, 6) AS cos_sim_r
        FROM ranked WHERE rank <= 5""")),

    // IVF-bucketed ANN — the coarse-quantizer scale path, oracled with
    // its k-means REFINEMENT included: the query surface runs the
    // integer-exact portable twin (md5-minimal seeds, vectors quantized
    // to round(u*1000) longs, Lloyd assignment by exact rational
    // Euclidean cost — see Vectors.ivfTopKPortable), so the DuckDB
    // oracle unrolls BOTH Lloyd iterations plus index/probe/rank from
    // scratch with no FP-summation-order hazard. ivfTopK's float
    // spherical k-means stays the engine-internal path (its seed/probe
    // semantics pinned by q52 at iters=0, its refinement bounded by
    // MlSpec/MlContainmentSpec).
    QueryDef("q47_ann_ivf",
      (s, d) => {
        val e = t(s, d, "embeddings")
        Vectors.ivfTopKPortable(e, e.where(col("vec_id") < 3),
            "vec_id", "embedding", k = 5, nlist = 16, nProbe = 6, iters = 2)
          .select(col("query_id"), col("corpus_id"), col("rank"),
            round(col("cos_sim"), 6).as("cos_sim_r"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        nn AS (SELECT vec_id, v,
            list_transform(v, x -> CAST(round(x / sqrt(list_dot_product(v, v)) * 1000) AS BIGINT)) AS qz
          FROM e),
        nq AS (SELECT vec_id, v, qz, list_dot_product(qz, qz) AS qq FROM nn),
        dims AS (SELECT unnest(range(64)) AS i),
        seeds AS (SELECT cluster, qz AS S, 1::BIGINT AS c,
            list_dot_product(qz, qz) AS ss
          FROM (SELECT qz, row_number() OVER (
              ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS cluster
            FROM nq) WHERE cluster < 16),
        asn1 AS (SELECT vec_id, cluster FROM (
            SELECT n.vec_id, s.cluster, row_number() OVER (PARTITION BY n.vec_id
                ORDER BY (s.c*s.c*n.qq - 2*s.c*list_dot_product(n.qz, s.S) + s.ss)
                         / CAST(s.c*s.c AS DOUBLE) ASC, s.cluster ASC) AS r
            FROM nq n, seeds s) WHERE r = 1),
        agg1 AS (SELECT cluster, list(s ORDER BY i) AS S, any_value(cnt) AS c,
            list_dot_product(list(s ORDER BY i), list(s ORDER BY i)) AS ss
          FROM (SELECT a.cluster, d.i, sum(n.qz[d.i + 1]) AS s, count(*) AS cnt
                FROM asn1 a JOIN nq n ON n.vec_id = a.vec_id, dims d
                GROUP BY a.cluster, d.i)
          GROUP BY cluster),
        asn2 AS (SELECT vec_id, cluster FROM (
            SELECT n.vec_id, s.cluster, row_number() OVER (PARTITION BY n.vec_id
                ORDER BY (s.c*s.c*n.qq - 2*s.c*list_dot_product(n.qz, s.S) + s.ss)
                         / CAST(s.c*s.c AS DOUBLE) ASC, s.cluster ASC) AS r
            FROM nq n, agg1 s) WHERE r = 1),
        agg2 AS (SELECT cluster, list(s ORDER BY i) AS S, any_value(cnt) AS c,
            list_dot_product(list(s ORDER BY i), list(s ORDER BY i)) AS ss
          FROM (SELECT a.cluster, d.i, sum(n.qz[d.i + 1]) AS s, count(*) AS cnt
                FROM asn2 a JOIN nq n ON n.vec_id = a.vec_id, dims d
                GROUP BY a.cluster, d.i)
          GROUP BY cluster),
        idx AS (SELECT vec_id, cluster FROM (
            SELECT n.vec_id, s.cluster, row_number() OVER (PARTITION BY n.vec_id
                ORDER BY (s.c*s.c*n.qq - 2*s.c*list_dot_product(n.qz, s.S) + s.ss)
                         / CAST(s.c*s.c AS DOUBLE) ASC, s.cluster ASC) AS r
            FROM nq n, agg2 s) WHERE r = 1),
        probe AS (SELECT vec_id AS query_id, cluster FROM (
            SELECT n.vec_id, s.cluster, row_number() OVER (PARTITION BY n.vec_id
                ORDER BY (s.c*s.c*n.qq - 2*s.c*list_dot_product(n.qz, s.S) + s.ss)
                         / CAST(s.c*s.c AS DOUBLE) ASC, s.cluster ASC) AS r
            FROM nq n, agg2 s WHERE n.vec_id < 3) WHERE r <= 6),
        scored AS (SELECT p.query_id, a.vec_id AS corpus_id,
            list_dot_product(cv.v, qv.v) /
              (sqrt(list_dot_product(cv.v, cv.v)) * sqrt(list_dot_product(qv.v, qv.v))) AS cos_sim
          FROM probe p
          JOIN idx a ON a.cluster = p.cluster
          JOIN e cv ON cv.vec_id = a.vec_id
          JOIN e qv ON qv.vec_id = p.query_id
          WHERE a.vec_id <> p.query_id),
        ranked AS (SELECT query_id, corpus_id, cos_sim, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id ASC) AS rank
          FROM scored)
        SELECT query_id, corpus_id, rank, round(cos_sim, 6) AS cos_sim_r
        FROM ranked WHERE rank <= 5""")),

    // IVF ANN PARITY: the same ivfTopK operator with md5-ordered seed
    // centroids and ZERO Lloyd iterations, so the whole index/probe/
    // rank pipeline — seed pick, double normalization, nearest-centroid
    // assignment, nProbe list selection, exact cosine ranking — is
    // recomputed from scratch by the DuckDB oracle. The k-means
    // REFINEMENT (iters>0) stays structural in q47: an iterative
    // driver loop is not one SQL expression, and the probe semantics
    // it feeds are exactly what q52 pins down.
    QueryDef("q52_ann_ivf_parity",
      (s, d) => {
        val e = t(s, d, "embeddings")
        Vectors.ivfTopK(e, e.where(col("vec_id") < 3),
            "vec_id", "embedding", k = 5, nlist = 16, nProbe = 4,
            iters = 0, portableSeeds = true)
          .select(col("query_id"), col("corpus_id"), col("rank"),
            round(col("cos_sim"), 6).as("cos_sim_r"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        n AS (SELECT vec_id, v,
            list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u FROM e),
        seeds AS (SELECT u, cluster FROM (
            SELECT u, row_number() OVER (
              ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS cluster
            FROM n) WHERE cluster < 16),
        cent AS (SELECT cluster,
            list_transform(u, x -> x / sqrt(list_dot_product(u, u))) AS c FROM seeds),
        asn AS (SELECT vec_id, cluster FROM (
            SELECT nn.vec_id, ct.cluster, row_number() OVER (
                PARTITION BY nn.vec_id
                ORDER BY list_dot_product(nn.u, ct.c) DESC, ct.cluster ASC) AS r
            FROM n nn, cent ct) WHERE r = 1),
        probe AS (SELECT vec_id AS query_id, cluster FROM (
            SELECT nn.vec_id, ct.cluster, row_number() OVER (
                PARTITION BY nn.vec_id
                ORDER BY list_dot_product(nn.u, ct.c) DESC, ct.cluster ASC) AS r
            FROM n nn, cent ct WHERE nn.vec_id < 3) WHERE r <= 4),
        scored AS (SELECT p.query_id, a.vec_id AS corpus_id,
            list_dot_product(cv.v, qv.v) /
              (sqrt(list_dot_product(cv.v, cv.v)) * sqrt(list_dot_product(qv.v, qv.v))) AS cos_sim
          FROM probe p
          JOIN asn a ON a.cluster = p.cluster
          JOIN e cv ON cv.vec_id = a.vec_id
          JOIN e qv ON qv.vec_id = p.query_id
          WHERE a.vec_id <> p.query_id),
        ranked AS (SELECT query_id, corpus_id, cos_sim, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id ASC) AS rank
          FROM scored)
        SELECT query_id, corpus_id, rank, round(cos_sim, 6) AS cos_sim_r
        FROM ranked WHERE rank <= 5""")),

    // multimodal: binary column byte accounting (portable oracle)
    QueryDef("q35_blob_bytes",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        octet_length(Multimodal.asBlob(col("text"))).as("n_bytes")),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
        FROM documents""")),

    // multimodal: REAL image decode + resize + frame sampling. Each
    // doc gets a real PNG (even ids) or JPEG (odd ids) rendered
    // distributed at dimensions derived from its id; the decode step
    // reads width/height/format back from the actual image HEADER via
    // javax.imageio (native expression, no pixel decode, no UDF). The
    // oracle knows the true metadata from the id formula, so the
    // decoder is checked against ground truth — decode, the
    // aspect-preserving resize arithmetic (maxSide 48 exercises both
    // the downscale and identity branches), and the stride-24 frame
    // sampling (video decode stays the documented md5 stub over the
    // text blob) all hash-checked.
    QueryDef("q36_multimodal_decode",
      (s, d) => {
        val withBlob = t(s, d, "documents").select(col("doc_id"),
          Multimodal.synthImage(
            (pmod(col("doc_id"), lit(64L)) + 16L).cast("int"),
            (pmod(col("doc_id"), lit(48L)) + 16L).cast("int"),
            when(pmod(col("doc_id"), lit(2L)) === 0, "png").otherwise("jpeg")).as("img"),
          Multimodal.asBlob(col("text")).as("blob"))
        val withMeta = withBlob
          .withColumn("meta", Multimodal.decodeImage(col("img")))
          .withColumn("resized", Multimodal.resizeMeta(col("meta"), 48))
        val frames = Multimodal.sampleFrames(withBlob, "blob", "doc_id", stride = 24)
          .groupBy("doc_id").agg(count(lit(1)).as("n_sampled_frames"),
            max("n_frames").as("n_frames"))
        withMeta.join(frames, Seq("doc_id"))
          .select(col("doc_id"),
            col("meta.width"), col("meta.height"), col("meta.format"),
            col("resized.width").as("rw"), col("resized.height").as("rh"),
            col("n_frames"), col("n_sampled_frames"))
      },
      Some("""WITH m AS (SELECT doc_id,
          CAST(doc_id % 64 + 16 AS INTEGER) AS width,
          CAST(doc_id % 48 + 16 AS INTEGER) AS height,
          CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
          CAST(CAST(concat('0x', substr(md5(text),19,6)) AS BIGINT) % 240 + 1 AS INTEGER) AS n_frames
          FROM documents)
        SELECT doc_id, width, height, format,
          CAST(ceil(width * least(1.0, 48.0/greatest(width,height))) AS INTEGER) AS rw,
          CAST(ceil(height * least(1.0, 48.0/greatest(width,height))) AS INTEGER) AS rh,
          n_frames, CAST((n_frames - 1) // 24 + 1 AS BIGINT) AS n_sampled_frames
        FROM m""")))
}
