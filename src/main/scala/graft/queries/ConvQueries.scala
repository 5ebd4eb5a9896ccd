package graft.queries

import org.apache.spark.sql.functions._

/** Typed-serialization scalar conversions (reference F6/F8/F9,
  * lib/json_tsv.js:120-165) and time-windowed aggregation, all with
  * exact SQL oracles. The int→IP / int→MAC conversions are pure bit
  * arithmetic — codegen'd, no UDFs. */
object ConvQueries {
  import Tables.t

  val defs: Seq[QueryDef] = Seq(
    // epoch-millis → ISO-8601 UTC string (F6: fromIntTime), bigint→dotted
    // IPv4 (F9: IPbigint2dotted), bigint→colon MAC (F8: MACbigint2colons),
    // derived deterministically from event_id so the oracle can reproduce
    QueryDef("q40_net_conversions",
      (s, d) => {
        val ev = t(s, d, "events")
        val ip = col("event_id") * 2654435761L % 4294967296L
        val mac = col("event_id") * 40503L % 281474976710656L
        def oct(shift: Int) = (ip.cast("long") / math.pow(2, shift).toLong % 256).cast("long")
        def hexByte(shift: Int) =
          lpad(hex((mac.cast("long") / math.pow(2, shift).toLong % 256).cast("long")), 2, "0")
        ev.select(
          col("event_id"),
          date_format(timestamp_millis(col("event_id") * 1000L + 1394496000000L),
            "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("iso_ts"),
          concat_ws(".", oct(24), oct(16), oct(8), oct(0)).as("ip_dotted"),
          lower(concat_ws(":", hexByte(40), hexByte(32), hexByte(24),
            hexByte(16), hexByte(8), hexByte(0))).as("mac_colons"))
      },
      Some("""SELECT event_id,
        strftime(to_timestamp((event_id * 1000 + 1394496000000) / 1000.0) AT TIME ZONE 'UTC',
          '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS iso_ts,
        concat_ws('.',
          (event_id * 2654435761 % 4294967296) // 16777216 % 256,
          (event_id * 2654435761 % 4294967296) // 65536 % 256,
          (event_id * 2654435761 % 4294967296) // 256 % 256,
          (event_id * 2654435761 % 4294967296) % 256) AS ip_dotted,
        lower(concat_ws(':',
          lpad(hex((event_id * 40503 % 281474976710656) // 1099511627776 % 256), 2, '0'),
          lpad(hex((event_id * 40503 % 281474976710656) // 4294967296 % 256), 2, '0'),
          lpad(hex((event_id * 40503 % 281474976710656) // 16777216 % 256), 2, '0'),
          lpad(hex((event_id * 40503 % 281474976710656) // 65536 % 256), 2, '0'),
          lpad(hex((event_id * 40503 % 281474976710656) // 256 % 256), 2, '0'),
          lpad(hex((event_id * 40503 % 281474976710656) % 256), 2, '0'))) AS mac_colons
        FROM events""")),

    // time-windowed aggregation (tumbling 1-day windows over the event
    // stream — the batch form of the streaming windowed agg)
    QueryDef("q41_time_window_agg",
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 day").getField("start").as("day_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("sum_value")),
      Some("""SELECT time_bucket(INTERVAL 1 DAY, ts) AS day_start, event_type,
        count(*) AS n,
        round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        FROM events GROUP BY 1, 2""")))
}
