package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{PowerSchema, TableManifest}

/** Power-schema split of the events table, checkable against plain SQL
  * (reference P1/K1/U1/D1 — the `_m`/`_r`/`_s` construction). */
object PowerQueries {
  import Tables.t

  val eventsManifest: TableManifest = TableManifest(
    name = "events",
    pk = "event_id",
    hct = Seq("event_id", "ts", "user_id", "value"),
    lct = Seq("event_type"),
    rtt = Seq("props"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q19_power_m",
      (s, d) => PowerSchema.mainTable(t(s, d, "events"), eventsManifest),
      Some("""SELECT event_id, ts, user_id, value, md5(event_type) AS _r_id
        FROM events""")),

    QueryDef("q20_power_r",
      (s, d) => PowerSchema.repetitiveTable(t(s, d, "events"), eventsManifest),
      Some("""SELECT DISTINCT md5(event_type) AS _r_id, event_type FROM events""")),

    QueryDef("q21_power_s",
      (s, d) => PowerSchema.sparseTable(t(s, d, "events"), eventsManifest),
      Some("""SELECT md5(concat_ws('|', CAST(event_id AS VARCHAR), 'props')) AS _s_id,
        event_id AS _m_id, md5(event_type) AS _r_id, 'props' AS tag, props AS value
        FROM events WHERE props IS NOT NULL""")),

    // the documented join surface over the triple (reference J1-J4,
    // jsonbQdemo/powerschemaquery.md:377-657): _s ⟕ _m ⟕ _r chained
    QueryDef("q21b_power_join_chain",
      (s, d) => {
        val ev = t(s, d, "events")
        val m = PowerSchema.mainTable(ev, eventsManifest)
          .withColumnRenamed("event_id", "_m_id").drop("_r_id")
        val r = PowerSchema.repetitiveTable(ev, eventsManifest)
        val sTab = PowerSchema.sparseTable(ev, eventsManifest)
        sTab.join(m, Seq("_m_id"), "left")
          .join(broadcast(r), Seq("_r_id"), "left")
          .groupBy("event_type", "tag")
          .agg(count(lit(1)).as("n"), max(col("user_id")).as("max_user"))
      },
      Some("""WITH m AS (SELECT event_id AS _m_id, ts, user_id, value, md5(event_type) AS _r_id FROM events),
        r AS (SELECT DISTINCT md5(event_type) AS _r_id, event_type FROM events),
        st AS (SELECT md5(concat_ws('|', CAST(event_id AS VARCHAR), 'props')) AS _s_id,
               event_id AS _m_id, md5(event_type) AS _r_id, 'props' AS tag, props AS value
               FROM events WHERE props IS NOT NULL)
        SELECT r.event_type, st.tag, count(*) AS n, max(m.user_id) AS max_user
        FROM st LEFT JOIN m ON st._m_id = m._m_id LEFT JOIN r ON st._r_id = r._r_id
        GROUP BY r.event_type, st.tag""")))
}
