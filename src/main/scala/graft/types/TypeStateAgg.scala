package graft.types

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, udaf}

/** Typestate inference as a Spark typed Aggregator: the map side folds
  * value strings (reference json2pgtypes per-shard pass,
  * /root/reference/manta/dc_inputs_2b.sh:38-60), Spark's partial/final
  * aggregation IS the reference's reduce phase (pgtypes_reduce single
  * reducer, /root/reference/manta/dc_inputs_3.sh:31-42) — except it
  * runs as a parallel tree instead of a one-node funnel.
  */
object TypeStateAgg extends Aggregator[String, TypeState, TypeState] {
  override def zero: TypeState = TypeState()
  override def reduce(b: TypeState, a: String): TypeState = TypeInference.update(b, a)
  override def merge(b1: TypeState, b2: TypeState): TypeState = TypeInference.merge(b1, b2)
  override def finish(r: TypeState): TypeState = r
  override def bufferEncoder: Encoder[TypeState] = Encoders.product[TypeState]
  override def outputEncoder: Encoder[TypeState] = Encoders.product[TypeState]

  /** Column form: typestate(col) usable inside one agg() across many
    * columns — a single pass over the data infers every column. */
  def typestate(c: Column): Column = udaf(TypeStateAgg).apply(c)
}

object InferTypes {
  import TypeStateAgg.typestate

  /** One-pass whole-table inference: every column folded to its
    * TypeState in a single aggregate (partial per partition, merged —
    * no second scan, no single-reducer funnel). Values are observed as
    * their JSON-ish string forms, like the reference's line scanner. */
  def inferTable(df: DataFrame, columns: Seq[String]): Map[String, TypeState] = {
    val aggs = columns.map(c => typestate(col(c).cast("string")).as(c))
    // spread a tiny single-split input before the per-row regex work
    // (guide §2.5 input skew; the partial→final merge is a monoid —
    // TypeStateSpec property — so partitioning cannot change the state)
    val row = graft.ml.Similarity.spread(df).agg(aggs.head, aggs.tail: _*).head()
    columns.map { c =>
      val r = row.getStruct(row.fieldIndex(c))
      c -> TypeState(r.getString(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getInt(6), r.getInt(7))
    }.toMap
  }

  /** Inference straight to DDL (reference entry point json2pgtypes →
    * outputpgtypes). */
  def inferDdl(df: DataFrame, table: String, money: Boolean = false): String = {
    val cols = df.columns.toSeq
    val states = inferTable(df, cols)
    TypeInference.toDdl(table, cols.map(c => c -> states(c)), money)
  }
}
