package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TagStats

/** The reference's measurement stage as driver queries (A4-A7): per-tag
  * D/M/U/Ib stats and the Q-score power-law classification, both with
  * exact SQL oracles. Plus the JSONB containment operator (F15 `@>`). */
object StatQueries {
  import Tables.t

  private val eventTags = Seq("event_type", "value", "props")
  private val docTags = Seq("lang", "source", "text", "n_chars")

  // FIXED scratch paths: the DuckDB oracles re-read these files via
  // parquet_metadata(), so the location must be static SQL text (the
  // Spark query runs first and overwrites; both stay inside the repo).
  // CONSTRAINT: one harness at a time per repo — a second concurrent
  // Verify over a DIFFERENT sf dir would overwrite these between this
  // run's Spark write and its oracle read. That is already the repo's
  // operating model (the sbt project lock serializes runs); a
  // multi-tenant deployment would key the path by input fingerprint.
  private val Q38ScratchDir = "/root/repo/target/scratch/q38-real-ib"
  private val Q58ScratchDir = "/root/repo/target/scratch/q58-ib-footers"

  private def duckStats(table: String, tags: Seq[String]): String =
    tags.map { c =>
      s"""SELECT '$c' AS tag, count($c) AS d,
        CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS m,
        count(DISTINCT CAST($c AS VARCHAR)) AS u,
        CAST(coalesce(sum(octet_length(encode(CAST($c AS VARCHAR)))), 0) AS BIGINT) AS ib
        FROM $table"""
    }.mkString(" UNION ALL ")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q37_tag_stats",
      (s, d) => TagStats.measure(t(s, d, "events"), eventTags),
      Some(duckStats("events", eventTags))),

    // Q-score classification over REAL information bytes: Ib is the
    // tags' actual compressed on-disk size — footer column-chunk totals
    // of a materialized write at a FIXED path (the reference measures
    // pbzip2-compressed size, measure/jsonvalues.sh:18-24) — and the
    // oracle independently re-reads the same footers through DuckDB's
    // parquet_metadata(), so Spark's extraction and the classify math
    // are both checked against the on-disk truth. The dictionary-
    // estimate mode stays available for single-pass measurement
    // (classify(realIb = false), spec-covered in TagStatsSpec).
    QueryDef("q38_qscore_classify",
      (s, d) => TagStats.classify(
        TagStats.measureReal(t(s, d, "documents"), docTags, Q38ScratchDir),
        realIb = true),
      Some(s"""WITH raw AS (${duckStats("documents", docTags)}),
        fib AS (SELECT path_in_schema AS tag,
            CAST(sum(total_compressed_size) AS BIGINT) AS rib
          FROM parquet_metadata('$Q38ScratchDir/*.parquet') GROUP BY 1),
        stats AS (SELECT raw.tag, d, m, u, fib.rib AS ib
          FROM raw JOIN fib ON raw.tag = fib.tag),
        scored AS (SELECT tag, d, m, u, ib,
          CAST(d AS DOUBLE) / (d + m) AS sp,
          CAST(u AS DOUBLE) / greatest(CAST(d AS DOUBLE), 1.0) AS cx,
          CAST(ib AS DOUBLE) AS ib_comp
          FROM stats)
        SELECT tag, d, m, u, ib,
          round(sp, 6) AS sp, round(cx, 6) AS cx, round(ib_comp, 3) AS ib_comp,
          round(log2(greatest(ib_comp, 1.0) * sp * cx), 6) AS q,
          CASE WHEN log2(greatest(ib_comp, 1.0) * sp * cx) > 0 THEN 'hct'
               WHEN sp < 0.15 THEN 'rtt' ELSE 'lct' END AS route
        FROM scored""")),

    // footer-extraction parity: Spark's driver-side column-chunk walk
    // vs DuckDB's parquet_metadata() over the SAME materialized files —
    // both compressed and uncompressed totals must agree byte-for-byte
    QueryDef("q58_parquet_ib_footers",
      (s, d) => {
        t(s, d, "events")
          .select(col("event_id"), col("event_type"), col("value"), col("props"))
          .write.mode("overwrite").parquet(Q58ScratchDir)
        val real = TagStats.compressedColumnBytes(Q58ScratchDir)
        import s.implicits._
        real.toSeq.sortBy(_._1)
          .map { case (tag, (c, u)) => (tag, c, u) }
          .toDF("tag", "ib_comp", "ib_unc")
      },
      Some(s"""SELECT path_in_schema AS tag,
          CAST(sum(total_compressed_size) AS BIGINT) AS ib_comp,
          CAST(sum(total_uncompressed_size) AS BIGINT) AS ib_unc
        FROM parquet_metadata('$Q58ScratchDir/*.parquet')
        GROUP BY 1""")),

    // JSONB containment `@>` over the simple object shape the demo
    // queries use (jsonbquery.md:270-306): props @> '{"k": 7}'
    QueryDef("q39_json_containment",
      (s, d) => t(s, d, "events")
        .where(get_json_object(col("props"), "$.k") === "7")
        .groupBy("event_type").agg(count(lit(1)).as("n")),
      Some("""SELECT event_type, count(*) AS n FROM events
        WHERE json_extract_string(props, '$.k') = '7' GROUP BY event_type""")),

    // RECURSIVE JSONB containment `@>` (jsonbquery.md:270-306, 350-387,
    // 477-512): nested-object + array-element needles over a composed
    // document, evaluated by the native JsonContainsExpr and oracled by
    // DuckDB's json_contains over a structurally identical doc
    QueryDef("q39b_jsonb_containment_nested",
      (s, d) => {
        import graft.functions.JsonContainsExpr.jsonContains
        val k = get_json_object(col("props"), "$.k").cast("int")
        val doc = to_json(struct(
          struct(col("event_type").as("type"),
            array(concat(lit("k"), k),
              concat(lit("u"), pmod(col("user_id"), lit(10L)))).as("tags")).as("meta"),
          k.as("k")))
        t(s, d, "events").select(col("event_type"), doc.as("doc"))
          .groupBy("event_type")
          .agg(
            sum(when(jsonContains(col("doc"),
              lit("""{"meta":{"tags":["k7"]}}""")), 1L).otherwise(0L)).as("n_tag_k7"),
            sum(when(jsonContains(col("doc"),
              lit("""{"k":7,"meta":{"type":"click"}}""")), 1L).otherwise(0L)).as("n_click_k7"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT event_type,
        CAST(sum(CASE WHEN json_contains(doc, '{"meta":{"tags":["k7"]}}') THEN 1 ELSE 0 END) AS BIGINT) AS n_tag_k7,
        CAST(sum(CASE WHEN json_contains(doc, '{"k":7,"meta":{"type":"click"}}') THEN 1 ELSE 0 END) AS BIGINT) AS n_click_k7,
        count(*) AS n
        FROM (SELECT event_type,
          json_object('meta', json_object('type', event_type,
            'tags', ['k'||k, 'u'||CAST(user_id%10 AS VARCHAR)]), 'k', k) AS doc
          FROM (SELECT event_type, user_id,
            CAST(json_extract_string(props,'$.k') AS INTEGER) AS k FROM events))
        GROUP BY event_type""")))
}
