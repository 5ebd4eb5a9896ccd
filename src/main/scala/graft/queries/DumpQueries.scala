package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.MorayDump

/** The reference's own input/provenance surface as driver queries:
  * the Moray dump format (S1-S3), lineage origin columns (P6), and
  * JSON array-index path access (jsonbquery.md:644-718). */
object DumpQueries {
  import Tables.t

  // tmpfs-backed per-run scratch (see Scratch): the dump/lineage dirs
  // are rebuilt from the parquet inputs on every invocation
  private def scratch(name: String): String = Scratch.dir(name)

  val defs: Seq[QueryDef] = Seq(
    // Moray dump round-trip: events rendered as a header+entry dump
    // (S4 wrap, lib/wrap_values.js:51-88), re-read positionally via the
    // header (S2, lib/moraydump_reorg.js:316-351), `_value` JSON doc
    // extracted (S3, lib/extract_values.js:47-90) and aggregated. The
    // oracle computes the same aggregate straight off the parquet
    // table, so every hop of the dump path must be lossless.
    QueryDef("q44_moray_dump_roundtrip",
      (s, d) => {
        val ev = t(s, d, "events")
        val asDump = ev.select(
          col("event_id").cast("string").as("_id"),
          md5(col("event_id").cast("string")).as("_key"),
          substring(md5(concat_ws("|", col("user_id"), col("event_type"),
            col("value").cast("string"))), 1, 8).as("_etag"),
          (unix_timestamp(col("ts")) * 1000).cast("string").as("_mtime"),
          to_json(struct(col("user_id"), col("event_type"), col("value"))).as("_value"))
        val dir = scratch("moraydump-")
        MorayDump.dumpLines(asDump, "events").coalesce(4)
          .write.mode("overwrite").text(dir)
        val back = MorayDump.readDump(s, dir)
        back.select(
            get_json_object(col("_value"), "$.event_type").as("event_type"),
            get_json_object(col("_value"), "$.user_id").cast("long").as("user_id"),
            col("_id").cast("long").as("event_id"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("user_id").as("sum_uid"),
            max("event_id").as("max_eid"))
      },
      Some("""SELECT event_type, count(*) AS n,
        CAST(sum(user_id) AS BIGINT) AS sum_uid, max(event_id) AS max_eid
        FROM events GROUP BY event_type""")),

    // lineage origin columns (P6, lib/moraydump_reorg.js:179-192,
    // 589-592): events written to per-datacenter directories, read back
    // through the file source's _metadata.file_path, origin extracted
    // and counted. The DC assignment (event_id % 3) is reproducible in
    // the oracle.
    QueryDef("q45_lineage_origin",
      (s, d) => {
        val ev = t(s, d, "events")
        val dir = scratch("lineage-")
        ev.withColumn("dc",
            concat(lit("dc"), pmod(col("event_id"), lit(3L)).cast("string")))
          .write.mode("overwrite").partitionBy("dc").json(dir)
        s.read.option("recursiveFileLookup", "true").text(dir)
          .select(regexp_extract(col("_metadata.file_path"), "dc=([^/]+)", 1)
            .as("origin_datacenter"))
          .groupBy("origin_datacenter")
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT 'dc' || CAST(event_id % 3 AS VARCHAR) AS origin_datacenter,
        count(*) AS n FROM events GROUP BY 1""")),

    // JSON array-index path access (`#>` with indexes / `$.a[0].b`,
    // jsonbquery.md:644-718): a composed doc with an array of objects,
    // filtered and projected by positional path. The oracle knows the
    // construction, so the expected output is direct SQL.
    QueryDef("q46_json_array_index",
      (s, d) => {
        // compose the doc from ONE extraction of k (non-cheap expr, so
        // CollapseProject keeps it materialized instead of re-parsing
        // props per use), then ONE from_json parse serves both
        // positional paths — the plan parses each JSON string exactly
        // once, vs one parse per get_json_object path
        val doc = to_json(struct(array(
          struct(col("k").as("v"), col("event_type").as("t")),
          struct((col("k") * 2).as("v"), lit("x").as("t"))).as("items")))
        t(s, d, "events")
          .select(col("event_id"), col("event_type"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
          .select(col("event_id"), doc.as("doc"))
          .select(col("event_id"), from_json(col("doc"),
            org.apache.spark.sql.types.DataType.fromDDL(
              "items ARRAY<STRUCT<v: INT, t: STRING>>")).as("p"))
          .select(col("event_id"),
            col("p.items").getItem(0).getField("v").as("v0"),
            col("p.items").getItem(1).getField("t").as("t1"))
          .where(col("v0").between(5, 15))
      },
      Some("""SELECT event_id, k AS v0, 'x' AS t1 FROM (
        SELECT event_id, CAST(json_extract_string(props,'$.k') AS INTEGER) AS k
        FROM events) WHERE k BETWEEN 5 AND 15""")),

    // Moray-column precedence + revert (P2, lib/moraydump_reorg.js:
    // 458-498 and the -r flag :86-90): the `_value` document carries an
    // `_etag` key for EVEN event_ids only (to_json drops null struct
    // fields, so odd rows have no key at all). Default precedence lets
    // the present key shadow the top-level Moray `_etag`; revert
    // restores the Moray value everywhere. Both modes of the same
    // operator run in one query; the oracle recomputes each from the
    // construction.
    QueryDef("q57_reorg_precedence",
      (s, d) => {
        val ev = t(s, d, "events")
        val asDump = ev.select(
          col("event_id").cast("string").as("_id"),
          lit("moray-etag").as("_etag"),
          (unix_timestamp(col("ts")) * 1000).cast("string").as("_mtime"),
          to_json(struct(
            when(pmod(col("event_id"), lit(2L)) === 0,
              concat(lit("value-etag-"), col("event_type"))).as("_etag"),
            col("user_id"), col("event_type"))).as("_value"))
        val targets = Seq("_etag", "user_id", "event_type")
        val both = graft.operators.Reorg.flattenValues(asDump, targets)
            .withColumn("mode", lit("default"))
          .unionByName(
            graft.operators.Reorg.flattenValues(asDump, targets, revert = true)
              .withColumn("mode", lit("revert")))
        both.groupBy(col("mode"), col("_etag").as("etag"))
          .agg(count(lit(1)).as("n"),
            sum(col("user_id").cast("long")).as("sum_uid"))
      },
      Some("""WITH dflt AS (
          SELECT CASE WHEN event_id % 2 = 0 THEN 'value-etag-' || event_type
                      ELSE 'moray-etag' END AS etag, user_id FROM events),
        rev AS (SELECT 'moray-etag' AS etag, user_id FROM events)
        SELECT 'default' AS mode, etag, count(*) AS n,
          CAST(sum(user_id) AS BIGINT) AS sum_uid FROM dflt GROUP BY etag
        UNION ALL
        SELECT 'revert' AS mode, etag, count(*) AS n,
          CAST(sum(user_id) AS BIGINT) AS sum_uid FROM rev GROUP BY etag""")))
}
