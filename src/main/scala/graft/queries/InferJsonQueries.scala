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
        val states = kv.groupBy("key")
          .agg(graft.types.TypeStateAgg.typestate(col("value")).as("st"))
          .collect() // one row per distinct JSON field name — tiny
        states.map { r =>
          val st = r.getStruct(1)
          val ts = graft.types.TypeState(st.getString(0), st.getString(1),
            st.getInt(2), st.getInt(3), st.getLong(4), st.getLong(5),
            st.getInt(6), st.getInt(7))
          (r.getString(0), TypeInference.toPgType(r.getString(0), ts),
            ts.tpe, ts.nMin, ts.nMax)
        }.toSeq.toDF("field", "pg_type", "base_type", "n_min", "n_max")
      },
      None),

    // embedding-cosine near-dup: planted perturbed copies (×1.02 scale
    // + tiny index-dependent jitter keeps cosine ≈ 1) must be recovered
    // by the LSH path without a full n² scan
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
        Vectors.lshTopK(all, all, "vec_id", "embedding", k = 1,
            planes = 6, tables = 12)
          .where(col("cos_sim") > 0.95)
          .select(least(col("query_id"), col("corpus_id")).as("id_a"),
            greatest(col("query_id"), col("corpus_id")).as("id_b"),
            round(col("cos_sim"), 4).as("cos_sim_r"))
          .distinct()
      },
      None))
}
