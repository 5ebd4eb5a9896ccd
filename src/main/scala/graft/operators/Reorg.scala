package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `_value` flatten with configurable Moray-column precedence —
  * reference P2 (/root/reference/lib/moraydump_reorg.js:458-498; the
  * `-r/--revert` flag :86-90).
  *
  * The dump-reorg step hoists the `_value` JSON document's keys up to
  * row level. A hoisted key may NAME an existing top-level Moray
  * column (`_etag`, `_mtime`, a custom index column); the reference
  * builds the output row Moray-first and lets matching `_value` keys
  * overwrite those entries — unless `-r` puts the Moray values back
  * afterwards. Spark-first equivalent, as one per-row projection:
  *
  *   - default (revert = false): a target key PRESENT in the `_value`
  *     document shadows the top-level column. Presence, not
  *     non-nullness (json_object_keys membership), so a document's
  *     explicit `"_etag": null` also shadows — matching the
  *     reference's values_keys membership test, which never inspects
  *     the value;
  *   - revert = true: the top-level Moray value wins wherever the
  *     column exists; `_value` keys fill only non-Moray targets.
  *
  * Targets come from the transform manifest (the reference's
  * psk.target.hct/lct lists); novel undeclared keys are the schema-
  * drift absorber's job (P3, graft.cdc.CdcApply.evolveSchema), not
  * this operator's. No shuffle, no UDF — json_object_keys +
  * get_json_object stay inside whole-stage codegen. */
object Reorg {

  def flattenValues(
      df: DataFrame, targets: Seq[String],
      valueCol: String = "_value", revert: Boolean = false): DataFrame = {
    val existing = df.columns.toSet
    require(existing.contains(valueCol), s"no $valueCol column to flatten")
    val present = json_object_keys(col(valueCol))
    val hoisted: Seq[Column] = targets.map { c =>
      val fromValue = get_json_object(col(valueCol), s"$$['$c']")
      val out =
        if (!existing.contains(c)) fromValue
        else if (revert) col(c)
        else when(array_contains(present, c), fromValue).otherwise(col(c))
      out.as(c)
    }
    val carried = df.columns.toSeq
      .filterNot(c => targets.contains(c) || c == valueCol).map(col)
    df.select(carried ++ hoisted: _*)
  }
}
