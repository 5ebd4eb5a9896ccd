package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.ml.Vectors
import graft.types.{InferTypes, TypeInference}

/** The reference's primary inference flow over a JSON corpus (S3+A1):
  * explode every document's fields and fold each field's value strings
  * into a typestate — `groupBy(field).agg(typestate)` is the
  * distributed form of json2pgtypes over a whole bucket dump. Plus the
  * embedding-cosine near-dup operator from the dedup family. */
object InferJsonQueries {
  import Tables.t

  val defs: Seq[QueryDef] = Seq(
    // infer the PG type of every field appearing inside events.props
    QueryDef("q42_infer_json_corpus",
      (s, d) => {
        import s.implicits._
        val kv = t(s, d, "events").select(
          explode(from_json(col("props"), MapType(StringType, StringType))))
        // one row per distinct JSON field name — tiny for any sane
        // corpus, but an adversarial unbounded key space must not
        // become a driver-side OOM: keep the most-populated fields
        val maxFields = 100000
        // the pg-type projection runs DISTRIBUTED (typed Dataset map
        // over the per-field typestates — one tiny row per field, no
        // driver round-trip): the lattice's final sizing rule is plain
        // Scala, so mapping the Dataset beats re-expressing it as a
        // column tree and beats the previous collect→toDF hop
        kv.groupBy("key")
          .agg(graft.types.TypeStateAgg.typestate(col("value")).as("st"),
            count(lit(1)).as("__n"))
          .orderBy(col("__n").desc, col("key"))
          .limit(maxFields)
          .select(col("key"), col("st.*"))
          .as[(String, String, String, Int, Int, Long, Long, Int, Int)]
          .map { case (k, status, tpe, size, arrC, nMin, nMax, sig, dec) =>
            val ts = graft.types.TypeState(
              status, tpe, size, arrC, nMin, nMax, sig, dec)
            (k, TypeInference.toPgType(k, ts), ts.tpe, ts.nMin, ts.nMax)
          }
          .toDF("field", "pg_type", "base_type", "n_min", "n_max")
      },
      // the oracle re-derives the expected inference for this corpus'
      // single numeric field: observed bounds + the outputpgtypes
      // integer-sizing rule (smallint/integer/bigint by nMin/nMax,
      // /root/reference/lib/outputpgtypes.js:76-118). The lattice's full
      // behavior is golden-tested in TypeInferenceSpec; this row checks
      // the distributed aggregation produced the right bounds and size.
      Some("""SELECT 'k' AS field,
        CASE WHEN min(k) >= -32768 AND max(k) <= 32767 THEN 'smallint'
             WHEN min(k) >= -2147483648 AND max(k) <= 2147483647 THEN 'integer'
             ELSE 'bigint' END AS pg_type,
        'integer' AS base_type,
        CAST(min(k) AS BIGINT) AS n_min, CAST(max(k) AS BIGINT) AS n_max
        FROM (SELECT CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
          FROM events)""")),

    // embedding-cosine near-dup: planted perturbed copies (tiny
    // md5-derived index-dependent jitter keeps cosine ≈ 1) must be
    // recovered by the symmetric LSH self-join path — shuffle join on
    // (tbl, bkt) with a hard per-bucket cap, never a corpus broadcast,
    // never a full n² scan. The jitter is md5-based (not xxhash64) so
    // the DuckDB oracle reproduces the corpus exactly; the oracle is the
    // EXHAUSTIVE O(n²) cosine self-join at the same 0.95 threshold —
    // with 12 planes × 12 tables, a planted pair at cos ≈ 0.999 is
    // missed with probability ≈ (1-(1-θ/π)^12)^12 < 1e-10, so the LSH
    // output must equal the exhaustive answer (q32's oracle pattern).
    QueryDef("q43_embed_neardups",
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        // jitter keys off a RENAMED copy of the original id: with the
        // bare name, Spark resolves `vec_id` inside the lambda to the
        // sibling alias (vec_id + 100000) — lateral resolution — while
        // the SQL oracle binds the source column; orig_id is unambiguous
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
        Vectors.lshNearDups(all, "vec_id", "embedding", minCosine = 0.95,
            planes = 12, tables = 12, maxBucket = 64)
          .select(col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim_r"))
      },
      Some("""WITH base AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        pert AS (
          -- base.vec_id qualified: DuckDB would otherwise resolve the
          -- bare name as the LATERAL alias (vec_id + 100000), while the
          -- Spark select resolves it against the input row
          SELECT base.vec_id + 100000 AS vec_id,
            list_transform(v, (x, i) -> x * (1.0 +
              (CAST(concat('0x', substr(md5(concat(CAST(base.vec_id AS VARCHAR), '|',
                CAST(i - 1 AS VARCHAR))), 1, 6)) AS BIGINT) % 7 - 3) / 100.0)) AS v
          FROM base),
        allv AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
          FROM allv a JOIN allv b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, round(cos, 4) AS cos_sim_r FROM pairs WHERE cos >= 0.95""")))
}
