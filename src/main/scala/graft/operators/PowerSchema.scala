package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Power-schema table triple: one input relation split into
  *   - `_m` (Main/HCT): high-complexity columns + FK to `_r`;
  *   - `_r` (Repetitive/LCT): low-complexity columns, deduplicated,
  *     keyed by a content hash `_r_id`;
  *   - `_s` (Sparse/RTT): rare columns unpivoted to (tag, value) rows.
  *
  * Reference semantics: construction lib/moraydump_reorg.js:423-637,
  * key graph jsonbQdemo/powerschemaquery.md:68-133, worked template
  * docs/writeup.md:316-388. Spark-first realization: three projections
  * of ONE scan — `_r` via dropDuplicates on the content hash (no global
  * sort needed, unlike the reference's `sort -r | uniq` funnel), `_s`
  * via a `stack` unpivot. The content hash uses a '|'-joined canonical
  * encoding rather than the reference's JSON.stringify — deterministic,
  * join-stable and computable by any SQL engine.
  */
case class TableManifest(
    name: String,
    pk: String,
    hct: Seq[String],
    lct: Seq[String],
    rtt: Seq[String])

object PowerSchema {

  /** Content-hash PK for the repetitive table (reference K1:
    * lib/moraydump_reorg.js:544-551). */
  def rId(lct: Seq[String]): Column =
    md5(concat_ws("|", lct.map(c => col(c).cast("string")): _*))

  def mainTable(df: DataFrame, m: TableManifest): DataFrame =
    df.select(m.hct.map(col) :+ rId(m.lct).as("_r_id"): _*)

  def repetitiveTable(df: DataFrame, m: TableManifest): DataFrame =
    df.select(rId(m.lct).as("_r_id") +: m.lct.map(col): _*)
      .dropDuplicates("_r_id")

  /** Rare-tag unpivot (reference U1: lib/moraydump_reorg.js:598-637).
    * One row per non-null rare column; surrogate `_s_id` derived from
    * (pk, tag) instead of uuid.v4 so tests are reproducible
    * (SURVEY.md §2.3 K2). */
  def sparseTable(df: DataFrame, m: TableManifest): DataFrame = {
    val stacked = m.rtt.map(c => s"'$c', cast(`$c` as string)").mkString(", ")
    df.select(
        col(m.pk).as("_m_id"), rId(m.lct).as("_r_id"),
        expr(s"stack(${m.rtt.size}, $stacked) as (tag, value)"))
      .where(col("value").isNotNull)
      .select(
        md5(concat_ws("|", col("_m_id").cast("string"), col("tag"))).as("_s_id"),
        col("_m_id"), col("_r_id"), col("tag"), col("value"))
  }

  def split(df: DataFrame, m: TableManifest): (DataFrame, DataFrame, DataFrame) =
    (mainTable(df, m), repetitiveTable(df, m), sparseTable(df, m))
}
