package graft.model

import org.apache.spark.sql.types._

/** A single transcript turn — the row type of the target lake table.
  *
  * Shape mandated by BASELINE.json `input_hint`:
  * (conv_id:string, turn_idx:int32, role:string, text:string,
  *  tool:string, ts:timestamp). `tool` is nullable and appears only
  * after the schema-evolution point (mirrors the reference's
  * novel-key absorption, /root/reference/lib/moraydump_reorg.js:501-529).
  */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: java.sql.Timestamp)

/** A change event in the binlog/WAL-style changelog.
  *
  * Envelope mirrors the Moray system columns the reference threads
  * through every bucket row (_etag change detection,
  * /root/reference/lib/backup_state.js:135-143) plus the txid total
  * order our exactly-once watermark needs.
  *
  *  - `_txid`: strictly increasing commit id (global total order)
  *  - `_op`  : insert | update | delete
  *  - `_etag`: 8-hex content hash of the payload (format per
  *    /root/reference/test/wf_m.sql `_etag varchar(8)`)
  */
case class ChangeEvent(
    _txid: Long,
    _op: String,
    _etag: String,
    conv_id: String,
    turn_idx: Int,
    role: Option[String],
    text: Option[String],
    tool: Option[String],
    ts: Option[java.sql.Timestamp])

object Model {
  /** MERGE key of the lake table (reference analogue: manifest pk,
    * /root/reference/lib/wf_keys_tojson.js:19). */
  val MergeKeys: Seq[String] = Seq("conv_id", "turn_idx")

  /** Payload columns of the v1 (pre-evolution) schema. */
  val baseTurnSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  /** Post-evolution schema (adds `tool`). */
  val evolvedTurnSchema: StructType =
    StructType(baseTurnSchema.fields.patch(4,
      Seq(StructField("tool", StringType)), 0))

  /** Change-event envelope columns (never stored in the table except
    * `_txid`/`_etag`, which ride along for CDC change detection). */
  val envelopeFields: Seq[StructField] = Seq(
    StructField("_txid", LongType, nullable = false),
    StructField("_op", StringType, nullable = false),
    StructField("_etag", StringType))

  val eventSchema: StructType =
    StructType(envelopeFields ++ evolvedTurnSchema.fields.map(_.copy(nullable = true)))
}
