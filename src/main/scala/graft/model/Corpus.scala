package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic change-event corpus over the transcript
  * schema (FIXTURES.md §2). Everything is a pure column expression
  * over `spark.range`, so generation itself is distributed and
  * scales with the cluster — no driver-side loops, no wall-clock,
  * no external data.
  *
  * Knobs mirror the properties the north rule tests:
  *  - Zipf-ish hot-conversation skew (`skew` exponent): conv 0 is hot
  *    — the salted repartition in the apply stage must absorb it.
  *  - duplicated txids every `dupEvery` events (exactly-once test);
  *  - deletes (`deletePct`), updates vs inserts;
  *  - mid-stream schema evolution: `tool` only for _txid > evolveAt;
  *  - out-of-order delivery: `shuffled` orders the changelog by a
  *    hash, not by txid (late data within unbounded lag — correctness
  *    comes from txid total order, not arrival order).
  */
object Corpus {

  val BaseEpochSec: Long = 1394496000L // 2014-03-11T00:00:00Z (reference data era)

  /** `n` change events over `nConvs` conversations with ≤ `maxTurns`
    * turns each. Deterministic in (n, nConvs, maxTurns, seed). */
  def changeEvents(
      spark: SparkSession,
      n: Long,
      nConvs: Int = 1000,
      maxTurns: Int = 50,
      seed: Long = 42L,
      skew: Double = 3.0,
      dupEvery: Int = 37,
      evolveFrac: Double = 0.6,
      partitions: Int = 0): DataFrame = {
    val base = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    val evolveAt = (n * evolveFrac).toLong
    def h(salt: Int) = abs(xxhash64(lit(seed + salt), col("id")))
    // skewed conversation pick: u^skew concentrates mass near conv 0
    val u = (h(1) % 1000000L).cast("double") / 1000000.0
    val convIdx = least(floor(pow(u, skew) * nConvs).cast("long"), lit(nConvs - 1L))
    val turnIdx = (h(2) % maxTurns).cast("int")
    val opRoll = h(3) % 100L
    val roleIdx = h(4) % 3L
    val txid = col("id") + 1L
    val events = base
      .withColumn("_txid", txid)
      .withColumn("conv_id", format_string("conv%08d", convIdx))
      .withColumn("turn_idx", turnIdx)
      .withColumn("_op",
        when(opRoll < lit(80), lit("update"))
          .when(opRoll < lit(92), lit("insert"))
          .otherwise(lit("delete")))
      .withColumn("role",
        when(col("_op") === "delete", lit(null).cast("string"))
          .otherwise(element_at(array(lit("user"), lit("assistant"), lit("tool")),
            (roleIdx + 1).cast("int"))))
      // revision id embedded so per-turn text equality detects a
      // wrong-version application (FIXTURES.md §2)
      .withColumn("text",
        when(col("_op") === "delete", lit(null).cast("string"))
          .otherwise(concat(lit("turn "), col("turn_idx"), lit(" of "),
            col("conv_id"), lit(" rev "), col("_txid"))))
      // schema evolution: `tool` exists only after the evolution point
      .withColumn("tool",
        when(col("_txid") > evolveAt && col("role") === "tool",
          concat(lit("tool_"), h(5) % 8L)).otherwise(lit(null).cast("string")))
      .withColumn("ts",
        when(col("_op") === "delete", lit(null).cast("timestamp"))
          .otherwise(timestamp_seconds(lit(BaseEpochSec) + col("_txid"))))
      .withColumn("_etag",
        substring(md5(concat_ws("|", col("conv_id"), col("turn_idx"),
          coalesce(col("text"), lit("")), col("_op"))), 1, 8))
      .drop("id")
      .select(Model.eventSchema.fieldNames.map(col).toSeq: _*)
    // exactly-once fixture: re-emit every dupEvery-th txid verbatim
    val dups = events.filter(pmod(col("_txid"), lit(dupEvery.toLong)) === 0L)
    events.unionAll(dups)
  }

  /** Same corpus, delivered out of order (bounded only by the batch). */
  def shuffled(events: DataFrame, seed: Long = 7L): DataFrame =
    events.orderBy(xxhash64(lit(seed), col("_txid"), col("_etag")))

  /** Reference-semantics oracle: the final table state is a direct
    * fold — per (conv_id, turn_idx) the highest-txid event wins, and
    * a winning delete removes the row. Independent of the engine's
    * incremental path; used to check replay equivalence. */
  def oracleFinalState(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id", "turn_idx").orderBy(col("_txid").desc)
    events
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("_op") =!= "delete")
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }
}
