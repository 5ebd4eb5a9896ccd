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
        val states = kv.groupBy("key")
          .agg(graft.types.TypeStateAgg.typestate(col("value")).as("st"),
            count(lit(1)).as("__n"))
          .orderBy(col("__n").desc, col("key"))
          .limit(maxFields)
          .drop("__n")
          .collect()
        states.map { r =>
          val st = r.getStruct(1)
          val ts = graft.types.TypeState(st.getString(0), st.getString(1),
            st.getInt(2), st.getInt(3), st.getLong(4), st.getLong(5),
            st.getInt(6), st.getInt(7))
          (r.getString(0), TypeInference.toPgType(r.getString(0), ts),
            ts.tpe, ts.nMin, ts.nMax)
        }.toSeq.toDF("field", "pg_type", "base_type", "n_min", "n_max")
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

    // embedding-cosine near-dup: planted perturbed copies (×1.02 scale
    // + tiny index-dependent jitter keeps cosine ≈ 1) must be recovered
    // by the symmetric LSH self-join path — shuffle join on (tbl, bkt)
    // with a hard per-bucket cap, never a corpus broadcast, never a
    // full n² scan
    QueryDef("q43_embed_neardups",
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val perturbed = e.select((col("vec_id") + 100000L).as("vec_id"),
          zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, i) => x.cast("double") * (lit(1.0) +
              (pmod(xxhash64(col("vec_id"), i), lit(7L)).cast("double") - 3.0) / 100.0))
            .as("embedding"))
        val all = e.select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("embedding"))
          .unionByName(perturbed)
        Vectors.lshNearDups(all, "vec_id", "embedding", minCosine = 0.95,
            planes = 12, tables = 12, maxBucket = 64)
          .select(col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim_r"))
      },
      None))
}
