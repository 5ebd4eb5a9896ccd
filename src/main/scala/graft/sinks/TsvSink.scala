package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.types.{TypeInference, TypeState}

/** Typed TSV sink for PostgreSQL `COPY` — the reference's serialization
  * stage (S6, /root/reference/lib/json_tsv.js:218-583) as pure column
  * expressions over one pass:
  *
  *  - null forms (`null`, empty, `\N`, `[""]`, `{}`, `[]`, `NaN`) render
  *    as `\N` (json_tsv.js:102-116, 280-283);
  *  - a column whose typestate finalized to `timestamptz` renders
  *    epoch-millis integers as ISO-8601 UTC (`fromIntTime`,
  *    json_tsv.js:120-129); ISO strings pass through;
  *  - `inet` renders bigints as dotted quads (`IPbigint2dotted`,
  *    json_tsv.js:152-159); `macaddr` renders bigints as colon hex
  *    (`MACbigint2colons`, :161-165);
  *  - `boolean` folds TRUE/T/FALSE/F to PG COPY's `t`/`f`;
  *  - ARRAY columns render JSON-array text as PG array literals
  *    (`{a,b}`), elements individually escaped;
  *  - everything else escapes `\`, TAB, LF per COPY text format.
  *
  * Input columns are the string-typed values of the dump world (the
  * type machine decides meaning, exactly as json_tsv takes the
  * typestate JSON via `-i`).
  */
object TsvSink {

  private val NullForms = Seq("null", "", "\\N", "[\"\"]", "{}", "[]", "NaN")

  private def escape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(
      c, "\\\\", "\\\\\\\\"), "\t", "\\\\t"), "\n", "\\\\n")

  private def isoFromMillis(c: Column): Column =
    date_format(timestamp_millis(c.cast("long")), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")

  private def dottedIp(c: Column): Column = {
    val v = c.cast("long")
    def oct(shift: Int) = (v / (1L << shift) % 256).cast("long")
    concat_ws(".", oct(24), oct(16), oct(8), oct(0))
  }

  private def colonMac(c: Column): Column = {
    val v = c.cast("long")
    def hx(shift: Int) = lpad(lower(hex((v / (1L << shift) % 256).cast("long"))), 2, "0")
    concat_ws(":", hx(40), hx(32), hx(24), hx(16), hx(8), hx(0))
  }

  private val Digits = "^-?[0-9]+$"

  /** One column's typed rendering (pre null-check). */
  private def renderValue(c: Column, pgType: String): Column = {
    val base = pgType.stripSuffix(" ARRAY")
    val scalar: Column => Column = v => base match {
      case "timestamptz" => when(v.rlike(Digits), isoFromMillis(v)).otherwise(v)
      case "inet" => when(v.rlike(Digits), dottedIp(v)).otherwise(v)
      case "macaddr" => when(v.rlike(Digits), colonMac(v)).otherwise(v)
      case "boolean" =>
        when(upper(v).isin("TRUE", "T"), "t")
          .when(upper(v).isin("FALSE", "F"), "f").otherwise(v)
      case _ => escape(v)
    }
    if (pgType.endsWith(" ARRAY"))
      // JSON array text → PG array literal, per-element typed rendering
      concat(lit("{"),
        concat_ws(",", transform(
          from_json(c, ArrayType(StringType)), e => scalar(e))),
        lit("}"))
    else scalar(c)
  }

  /** Render every column by its typestate into one TSV `value` column
    * (ready for `.write.text`). */
  def render(df: DataFrame, types: Map[String, TypeState]): DataFrame = {
    val cols = df.columns.toSeq.map { name =>
      val pg = types.get(name)
        .map(st => TypeInference.toPgType(name, st)).getOrElse("varchar(1)")
      val v = col(name).cast("string")
      when(v.isNull || v.isin(NullForms: _*), "\\N")
        .otherwise(renderValue(v, pg))
    }
    df.select(concat_ws("\t", cols: _*).as("value"))
  }

  /** Write `df` as COPY-ready TSV shards. */
  def write(df: DataFrame, types: Map[String, TypeState], path: String,
      parts: Int = 1): Unit =
    render(df, types).coalesce(parts).write.mode("overwrite").text(path)
}
