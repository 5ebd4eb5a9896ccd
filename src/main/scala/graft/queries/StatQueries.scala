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

    QueryDef("q38_qscore_classify",
      (s, d) => TagStats.classify(TagStats.measure(t(s, d, "documents"), docTags)),
      Some(s"""WITH stats AS (${duckStats("documents", docTags)}),
        scored AS (SELECT tag, d, m, u, ib,
          CAST(d AS DOUBLE) / (d + m) AS sp,
          CAST(u AS DOUBLE) / greatest(CAST(d AS DOUBLE), 1.0) AS cx,
          CAST(u AS DOUBLE) * (CAST(ib AS DOUBLE) / greatest(CAST(d AS DOUBLE), 1.0))
            + greatest(CAST(d AS DOUBLE), 1.0) * log2(CAST(u AS DOUBLE) + 1.0) / 8.0 AS ib_comp
          FROM stats)
        SELECT tag, d, m, u, ib,
          round(sp, 6) AS sp, round(cx, 6) AS cx, round(ib_comp, 3) AS ib_comp,
          round(log2(greatest(ib_comp, 1.0) * sp * cx), 6) AS q,
          CASE WHEN log2(greatest(ib_comp, 1.0) * sp * cx) > 0 THEN 'hct'
               WHEN sp < 0.15 THEN 'rtt' ELSE 'lct' END AS route
        FROM scored""")),

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
