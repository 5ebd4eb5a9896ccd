package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.CdcApply
import graft.table.LakeTable

/** CDC queries the driver can check against a DuckDB oracle: the events
  * table is reinterpreted as a change-event stream — key = (user_id,
  * event_type), version = event_id, delete when value < 5 — replayed
  * through the REAL engine (LakeTable + CdcApply), and the final table
  * state must equal the oracle's direct "last event wins" SQL fold.
  * This is the north-rule correctness check wired into the driver's
  * own gate (reference analogue: final PostgreSQL table state after
  * loading the last snapshot).
  */
object CdcQueries {
  import Tables.t

  /** max(_txid) of the derived changelog WITHOUT a Spark job: _txid =
    * event_id + 1, so the max is max(event_id)+1 read from the events
    * table's parquet-footer COLUMN STATISTICS (driver-side metadata —
    * removes the one-aggregate job each changelog query used to pay).
    * Column stats, not the row count: the DuckDB oracles model the cut
    * as (max(event_id)+1)/2, which equals the count only while ids are
    * dense 0..n-1 — stats match the oracle's semantics at any id
    * distribution. Footers without stats fall back to the real
    * aggregate (correctness over the saved job). */
  private def maxTxid(s: SparkSession, d: String): Long =
    LakeTable.footerLongMax(
        java.nio.file.Paths.get(s"$d/events.parquet"), "event_id")
      .map(_ + 1L)
      .getOrElse(asChangeEvents(s, d).agg(max(col("_txid"))).head().getLong(0))

  /** Map the driver's events table onto the change-event envelope.
    * turn_idx must be INJECTIVE in event_type — a collision would merge
    * two distinct (user_id, event_type) streams and silently diverge
    * from the oracle — so it's the dense rank of event_type over the
    * (tiny) distinct set, broadcast-joined back. */
  def asChangeEvents(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(s, d, "events")
    val dim = ev.select("event_type").distinct()
      .withColumn("turn_idx",
        (row_number().over(Window.orderBy("event_type")) - 1).cast("int"))
    ev.join(broadcast(dim), Seq("event_type"))
      .select(
        (col("event_id") + 1L).as("_txid"),
        when(col("value") < 5.0, "delete").otherwise("update").as("_op"),
        substring(md5(concat_ws("|", col("user_id"), col("event_type"),
          col("value").cast("string"))), 1, 8).as("_etag"),
        col("user_id").cast("string").as("conv_id"),
        col("turn_idx"),
        col("user_id"), col("event_type"), col("value"), col("ts"))
  }

  // tmpfs-backed per-run scratch (see Scratch): these tables/segments/
  // checkpoints are rebuilt from the parquet inputs on every invocation
  private def scratch(name: String): String = Scratch.dir(name)

  /** The changelog queries (q54/q55/q56) share ONE replayed scratch
    * table per sf dir: the operator each of them measures is the
    * changelog/snapshot READ, not the half/half replay that builds its
    * input — and bench reps then time the read path instead of paying
    * the same replay three times. The table is immutable once built
    * (both halves applied before publication in the map). Returns
    * (table, v1 = mid-replay version, head version, cut txid). */
  private val changelogScratch =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long, Long, Long)]()
  private def changelogTable(s: SparkSession,
      d: String): (LakeTable, Long, Long, Long) = {
    val (dir, v1, v2, cut) = changelogScratch.computeIfAbsent(d, _ => {
      val ev = asChangeEvents(s, d)
      val cutTx = maxTxid(s, d) / 2
      val t = new LakeTable(scratch("cdflog-"), numBuckets = 16)
      CdcApply.applyBatch(s, t, ev.where(col("_txid") <= cutTx))
      val mid = t.currentCommit().get.version
      CdcApply.applyBatch(s, t, ev.where(col("_txid") > cutTx))
      (t.location, mid, t.currentCommit().get.version, cutTx)
    })
    (new LakeTable(dir, numBuckets = 16), v1, v2, cut)
  }

  private def replayThenRead(s: SparkSession, d: String, nBatches: Int): DataFrame = {
    val table = new LakeTable(scratch(s"cdc$nBatches-"), numBuckets = 16)
    CdcApply.replay(s, table, asChangeEvents(s, d), nBatches)
    table.read(s).select(
      col("user_id"), col("event_type"), col("value"), col("ts"),
      (col("_txid") - 1L).as("event_id"))
  }

  private val lastWriterOracle: String =
    """SELECT user_id, event_type, value, ts, event_id FROM (
      SELECT user_id, event_type, value, ts, event_id,
        row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
      FROM events) WHERE rn = 1 AND value >= 5.0"""

  val defs: Seq[QueryDef] = Seq(
    // pure-SQL expression of "latest event wins per key" (window §2.8)
    QueryDef("q14_cdc_last_writer_sql",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id", "event_type").orderBy(col("event_id").desc)
        t(s, d, "events")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1 && col("value") >= 5.0)
          .select("user_id", "event_type", "value", "ts", "event_id")
      },
      Some(lastWriterOracle)),

    // the real engine, single batch
    QueryDef("q15_cdc_replay_engine",
      (s, d) => replayThenRead(s, d, 1), Some(lastWriterOracle)),

    // the real engine, incremental (4 commits, bucket-pruned merges)
    QueryDef("q16_cdc_replay_batches",
      (s, d) => replayThenRead(s, d, 4), Some(lastWriterOracle)),

    // snapshot diff by etag (reference D5: /root/reference/manta/dc_diff.sh):
    // keys whose latest content in the 2nd half differs from the 1st half
    QueryDef("q17_snapshot_diff",
      (s, d) => {
        val ev = t(s, d, "events")
        val mid = 15L // days: split the month of events at 2024-01-15
        val cut = lit("2024-01-15").cast("timestamp")
        def latest(df: DataFrame) = {
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy("user_id", "event_type").orderBy(col("event_id").desc)
          df.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
            .select(col("user_id"), col("event_type"),
              substring(md5(concat_ws("|", col("user_id"), col("event_type"),
                col("value").cast("string"))), 1, 8).as("_etag"))
        }
        val before = latest(ev.where(col("ts") < cut))
        val after = latest(ev)
        after.join(before, Seq("user_id", "event_type", "_etag"), "left_anti")
          .groupBy("event_type").agg(count(lit(1)).as("n_changed"))
      },
      Some("""WITH latest_before AS (
          SELECT user_id, event_type,
            substr(md5(concat_ws('|', user_id, event_type, CAST(value AS VARCHAR))), 1, 8) AS _etag
          FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) rn
                FROM events WHERE ts < TIMESTAMP '2024-01-15') WHERE rn = 1),
        latest_after AS (
          SELECT user_id, event_type,
            substr(md5(concat_ws('|', user_id, event_type, CAST(value AS VARCHAR))), 1, 8) AS _etag
          FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) rn
                FROM events) WHERE rn = 1)
        SELECT a.event_type, count(*) AS n_changed FROM latest_after a
        WHERE NOT EXISTS (SELECT 1 FROM latest_before b
          WHERE b.user_id = a.user_id AND b.event_type = a.event_type AND b._etag = a._etag)
        GROUP BY a.event_type""")),

    // the full Structured Streaming tail: events → NDJSON changelog →
    // readStream → foreachBatch merge-apply → final table state
    QueryDef("q28_cdc_stream_replay",
      (s, d) => {
        val logDir = scratch("streamlog-")
        graft.streaming.CdcStream.writeSegment(
          asChangeEvents(s, d), logDir, parts = 4)
        val table = new LakeTable(scratch("streamtbl-"), numBuckets = 16)
        graft.streaming.CdcStream.runOnce(s, logDir, table,
          scratch("streamckpt-"), maxFilesPerTrigger = 2)
        table.read(s).select(
          col("user_id").cast("bigint").as("user_id"),
          col("event_type"), col("value"), col("ts"),
          (col("_txid") - 1L).as("event_id"))
      },
      Some(lastWriterOracle)),

    // watermarked streaming windowed aggregation (§2.12 last row):
    // events → NDJSON → readStream → 6h tumbling windows per user with a
    // 1h lateness watermark, APPEND mode (only watermark-closed windows
    // are emitted). The oracle computes the same windows in batch SQL
    // and keeps exactly those the final watermark (max ts − 1h) has
    // provably closed — so the streaming eviction semantics themselves
    // are what the driver hash-checks. Window starts surface as epoch
    // seconds (both engines' native timestamp renderings differ).
    QueryDef("q49_stream_window_agg",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val logDir = scratch("winlog-")
        // explicit ts order: segments must arrive watermark-
        // monotonically for the closed-window oracle to model the
        // stream's eviction. Three ts-RANGED segment dirs written in
        // ts order (mod-time order = the file source's replay order);
        // rows stay unordered WITHIN a segment, so cross-batch
        // eviction is genuinely exercised. (The previous orderBy +
        // coalesce(parts) form silently wrote ONE file once AQE
        // coalesced the sort to one partition — a single-batch stream
        // that never tested eviction.)
        val ev = t(s, d, "events").select(col("user_id"), col("ts"))
        // parquet ts is TIMESTAMP_NTZ, which cannot cast to long
        // directly — hop through TIMESTAMP (UTC session)
        val tsl = col("ts").cast("timestamp").cast("long")
        // 0.01 relative error: the thirds only need to be roughly equal
        // (exact GK at 0.0 retains ~every distinct value driver-side);
        // an all-null/empty ts column yields NO quantiles — fall back
        // to one segment rather than indexing an empty array
        val qs = ev.where(col("ts").isNotNull)
          .withColumn("tsl", tsl).stat.approxQuantile("tsl", Array(0.34, 0.67), 0.01)
        val bounds = if (qs.length == 2) qs else Array(Double.MaxValue, Double.MaxValue)
        Seq(
          tsl.isNull || tsl <= bounds(0),
          tsl > bounds(0) && tsl <= bounds(1),
          tsl > bounds(1)).zipWithIndex.foreach { case (cond, i) =>
          graft.streaming.CdcStream.writeSegment(ev.where(cond), s"$logDir/seg$i")
        }
        val parsed = s.readStream.option("maxFilesPerTrigger", 1)
          .text(s"$logDir/seg*")
          .select(
            get_json_object(col("value"), "$.user_id").cast("bigint").as("user_id"),
            get_json_object(col("value"), "$.ts").cast("timestamp").as("ts"))
          .where(col("ts").isNotNull)
        val windowed = parsed
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "6 hours").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").cast("long").as("win_start"), col("user_id"), col("n"))
        val sink = "q49_win_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val q = windowed.writeStream
          .option("checkpointLocation", scratch("winckpt-"))
          .format("memory").queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(sink)
      },
      Some("""WITH e AS (SELECT user_id, ts FROM events WHERE ts IS NOT NULL),
        win AS (SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS win_start,
                  user_id, count(*) AS n
                FROM e GROUP BY 1, 2)
        SELECT win_start, user_id, n FROM win
        WHERE win_start + 21600 <= (SELECT epoch(max(ts)) - 3600 FROM e)""")),

    // point lookup through the lake table's bucket pruning: replay,
    // then read ONE conversation — the engine prunes the scan to the
    // single bucket its key hashes to (PlanSpec asserts the file-level
    // pruning; here the driver checks the VALUES against the oracle's
    // filtered last-writer fold)
    QueryDef("q48_point_lookup_pruned",
      (s, d) => {
        // the operator measured here is the point LOOKUP through bucket
        // pruning, not the replay that builds its input — so it shares
        // the one replayed scratch table with q54/q55/q56 (same
        // doctrine as changelogTable's doc): the half/half replay's
        // final state is the same pure function of the event set as
        // the previous per-query single-batch build (idempotent keyed
        // upsert), and the driver oracle hash-checks the VALUES.
        val (table, _, _, _) = changelogTable(s, d)
        val conv = "1"
        // modulus from the table handle, not a literal — q48 must stay
        // in lockstep with changelogTable's layout if it is ever tuned
        val bucket = s.range(1)
          .select(pmod(xxhash64(lit(conv)),
            lit(table.effectiveNumBuckets.toLong)).cast("int"))
          .head().getInt(0)
        table.readBuckets(s, Seq(bucket))
          .where(col("conv_id") === conv &&
            !coalesce(col("_deleted"), lit(false)))
          .select(col("user_id"), col("event_type"), col("value"), col("ts"),
            (col("_txid") - 1L).as("event_id"))
      },
      Some("""SELECT user_id, event_type, value, ts, event_id FROM (
        SELECT user_id, event_type, value, ts, event_id,
          row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
        FROM events WHERE user_id = 1) WHERE rn = 1 AND value >= 5.0""")),

    // declared column rename mid-replay (north rule: "renamed transcript
    // fields"): replay half the changelog, ALTER-RENAME value→score
    // (metadata-only commit), replay the rest STILL carrying the old
    // name (an unmigrated producer). The reader must surface every
    // vintage under the new name and the schema must not re-absorb the
    // retired one — the oracle is the plain last-writer fold with the
    // column aliased, so any dropped/duplicated/misrouted value
    // hash-mismatches.
    QueryDef("q53_rename_evolution",
      (s, d) => {
        val ev = asChangeEvents(s, d)
        val cut = maxTxid(s, d) / 2
        val table = new LakeTable(scratch("rename-"), numBuckets = 16)
        CdcApply.applyBatch(s, table, ev.where(col("_txid") <= cut))
        table.renameColumn("value", "score")
        CdcApply.applyBatch(s, table, ev.where(col("_txid") > cut))
        table.read(s).select(
          col("user_id"), col("event_type"), col("score"), col("ts"),
          (col("_txid") - 1L).as("event_id"))
      },
      Some("""SELECT user_id, event_type, value AS score, ts, event_id FROM (
        SELECT user_id, event_type, value, ts, event_id,
          row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
        FROM events) WHERE rn = 1 AND value >= 5.0""")),

    // incremental changelog read (CDC-out, Delta CDF / Iceberg
    // changelog-view semantics): replay the first half of the
    // changelog, then the rest, and ask the TABLE for the net
    // row-level changes between the two snapshots. The oracle
    // recomputes both half-states as last-writer folds and diffs them
    // — insert/update/delete classification, post-images for upserts,
    // PRE-images for deletes (reference analogue: the full-dump etag
    // diff, /root/reference/manta/dc_diff.sh, as a metadata-pruned
    // lake read instead of a re-scan)
    QueryDef("q54_changelog_read",
      (s, d) => {
        val (table, v1, v2, _) = changelogTable(s, d)
        table.changesBetween(s, v1, v2).select(
          col("_change_type"), col("user_id"), col("event_type"),
          col("value"), col("ts"), (col("_txid") - 1L).as("event_id"))
      },
      Some("""WITH s1 AS (
          SELECT user_id, event_type, value, ts, event_id FROM (
            SELECT e.*, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) rn
            FROM events e WHERE event_id + 1 <= (SELECT (max(event_id) + 1) // 2 FROM events))
          WHERE rn = 1 AND value >= 5.0),
        s2 AS (
          SELECT user_id, event_type, value, ts, event_id FROM (
            SELECT e.*, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) rn
            FROM events e)
          WHERE rn = 1 AND value >= 5.0)
        SELECT
          CASE WHEN s1.event_id IS NULL THEN 'insert'
               WHEN s2.event_id IS NULL THEN 'delete'
               ELSE 'update' END AS _change_type,
          coalesce(s2.user_id, s1.user_id) AS user_id,
          coalesce(s2.event_type, s1.event_type) AS event_type,
          CASE WHEN s2.event_id IS NULL THEN s1.value ELSE s2.value END AS value,
          CASE WHEN s2.event_id IS NULL THEN s1.ts ELSE s2.ts END AS ts,
          CASE WHEN s2.event_id IS NULL THEN s1.event_id ELSE s2.event_id END AS event_id
        FROM s2 FULL OUTER JOIN s1
          ON s1.user_id = s2.user_id AND s1.event_type = s2.event_type
        WHERE s1.event_id IS NULL OR s2.event_id IS NULL
           OR s1.event_id <> s2.event_id""")),

    // changelog read, Delta-CDF full form: same half/half replay as
    // q54, but updates emit BOTH images (update_preimage from the old
    // snapshot, update_postimage from the new) — what an incremental
    // aggregator needs to subtract old contributions. The oracle
    // recomputes the diff and unions the four row kinds.
    QueryDef("q56_changelog_pairs",
      (s, d) => {
        val (table, v1, v2, _) = changelogTable(s, d)
        table.changesBetween(s, v1, v2, imagePairs = true).select(
          col("_change_type"), col("user_id"), col("event_type"),
          col("value"), col("ts"), (col("_txid") - 1L).as("event_id"))
      },
      Some("""WITH s1 AS (
          SELECT user_id, event_type, value, ts, event_id FROM (
            SELECT e.*, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) rn
            FROM events e WHERE event_id + 1 <= (SELECT (max(event_id) + 1) // 2 FROM events))
          WHERE rn = 1 AND value >= 5.0),
        s2 AS (
          SELECT user_id, event_type, value, ts, event_id FROM (
            SELECT e.*, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) rn
            FROM events e)
          WHERE rn = 1 AND value >= 5.0),
        j AS (
          SELECT s1.user_id AS o_user_id, s1.event_type AS o_event_type,
                 s1.value AS o_value, s1.ts AS o_ts, s1.event_id AS o_event_id,
                 s2.user_id AS n_user_id, s2.event_type AS n_event_type,
                 s2.value AS n_value, s2.ts AS n_ts, s2.event_id AS n_event_id
          FROM s2 FULL OUTER JOIN s1
            ON s1.user_id = s2.user_id AND s1.event_type = s2.event_type
          WHERE s1.event_id IS NULL OR s2.event_id IS NULL
             OR s1.event_id <> s2.event_id)
        SELECT 'insert' AS _change_type, n_user_id AS user_id,
               n_event_type AS event_type, n_value AS value, n_ts AS ts,
               n_event_id AS event_id
        FROM j WHERE o_event_id IS NULL
        UNION ALL
        SELECT 'delete', o_user_id, o_event_type, o_value, o_ts, o_event_id
        FROM j WHERE n_event_id IS NULL
        UNION ALL
        SELECT 'update_preimage', o_user_id, o_event_type, o_value, o_ts, o_event_id
        FROM j WHERE o_event_id IS NOT NULL AND n_event_id IS NOT NULL
        UNION ALL
        SELECT 'update_postimage', n_user_id, n_event_type, n_value, n_ts, n_event_id
        FROM j WHERE o_event_id IS NOT NULL AND n_event_id IS NOT NULL""")),

    // snapshot time travel (Iceberg VERSION AS OF): replay both halves,
    // then read the MID-replay snapshot by changelog position — must
    // equal the oracle's last-writer fold truncated at the same txid,
    // even though the table has since advanced
    QueryDef("q55_time_travel",
      (s, d) => {
        val (table, _, _, cut) = changelogTable(s, d)
        val v1 = table.versionAt(cut).get
        table.readVersion(s, v1).select(
          col("user_id"), col("event_type"), col("value"), col("ts"),
          (col("_txid") - 1L).as("event_id"))
      },
      Some("""SELECT user_id, event_type, value, ts, event_id FROM (
        SELECT user_id, event_type, value, ts, event_id,
          row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id + 1 <= (SELECT (max(event_id) + 1) // 2 FROM events))
        WHERE rn = 1 AND value >= 5.0""")),

    // exact dedup by content hash (reference D1/K1: md5 row hash + uniq)
    QueryDef("q18_dedup_exact",
      (s, d) => t(s, d, "events")
        .withColumn("_row_hash", md5(concat_ws("|",
          col("user_id"), col("event_type"), col("value").cast("string"), col("props"))))
        .groupBy("_row_hash")
        .agg(min(col("event_id")).as("keep_event_id"), count(lit(1)).as("n_copies")),
      Some("""SELECT md5(concat_ws('|', user_id, event_type, CAST(value AS VARCHAR), props)) AS _row_hash,
        min(event_id) AS keep_event_id, count(*) AS n_copies
        FROM events GROUP BY 1""")))
}
