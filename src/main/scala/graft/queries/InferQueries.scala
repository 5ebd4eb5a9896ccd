package graft.queries

import org.apache.spark.sql.functions._

import graft.types.{InferTypes, TypeInference}

/** Schema-inference exposed as driver queries. The full typestate →
  * PG-DDL pipeline is not SQL-expressible, so q29 carries no DuckDB
  * oracle (rows-only check); its semantics are golden-tested in
  * TypeInferenceSpec against the reference's documented behaviors. */
object InferQueries {
  import Tables.t

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q29_infer_pg_types",
      (s, d) => {
        import s.implicits._
        val ev = t(s, d, "events")
        val states = InferTypes.inferTable(ev, ev.columns.toSeq)
        ev.columns.toSeq.map { c =>
          val st = states(c)
          (c, TypeInference.toPgType(c, st), st.tpe, st.size.toLong)
        }.toDF("column_name", "pg_type", "base_type", "max_size")
      },
      None))
}
