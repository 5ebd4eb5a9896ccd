package graft.queries

import org.apache.spark.sql.functions._

import graft.types.{InferTypes, TypeInference}

/** Schema-inference exposed as driver queries. q29's oracle is the
  * reference type lattice REIMPLEMENTED in DuckDB SQL — matchType's
  * ordered rule chain (boolean > integer-with-leading-zero-guard >
  * real > ISO timestamp > uuid > mac > inet > jsonb-shape > varchar,
  * json2pgtypes.js:648-894), the typeThatWins promotion over the
  * observed match-type set (:613-643), the epoch-window and ufds
  * integer→timestamptz promotions, smallint/int/bigint bounds, the
  * sigfig-driven real/double split, and the null-form skip list — so
  * the whole typestate machine is checked against an independent
  * engine, not just golden files. (The JSON-scalar-array unwrap path
  * is not exercised by the events table; it stays golden-tested in
  * TypeInferenceSpec.) */
object InferQueries {
  import Tables.t

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q29_infer_pg_types",
      (s, d) => {
        import s.implicits._
        val ev = t(s, d, "events")
        val states = InferTypes.inferTable(ev, ev.columns.toSeq)
        ev.columns.toSeq.map { c =>
          val st = states(c)
          (c, TypeInference.toPgType(c, st), st.tpe, st.size.toLong)
        }.toDF("column_name", "pg_type", "base_type", "max_size")
      },
      Some("""WITH s AS (
          SELECT CAST(event_id AS VARCHAR) AS event_id, CAST(ts AS VARCHAR) AS ts,
                 CAST(user_id AS VARCHAR) AS user_id, CAST(event_type AS VARCHAR) AS event_type,
                 CAST(value AS VARCHAR) AS value, CAST(props AS VARCHAR) AS props
          FROM events
        ), u AS (
          UNPIVOT s ON event_id, ts, user_id, event_type, value, props
          INTO NAME column_name VALUE v0
        ), vals AS (
          SELECT column_name, trim(v0) AS v FROM u
          WHERE v0 IS NOT NULL AND trim(v0) NOT IN
            ('null', '', '\N', '\\n', '[""]', '{}', '[]', 'NaN', 'default')
        ), m AS (
          SELECT column_name, v,
            CASE
              WHEN upper(v) IN ('TRUE','FALSE','T','F') THEN 'boolean'
              WHEN regexp_full_match(v, '-?[0-9]+')
                AND NOT (len(v) > 1 AND starts_with(v, '0'))
                AND NOT (len(v) > 2 AND starts_with(v, '-0'))
                AND len(replace(v, '-', '')) <= 19 THEN 'integer'
              WHEN regexp_full_match(v, '-?([0-9]+\.[0-9]*|[0-9]*\.[0-9]+|[0-9]+)([eE][+-]?[0-9]+)?')
                AND (contains(v, '.') OR contains(lower(v), 'e')) THEN 'real'
              WHEN regexp_full_match(v, '[0-9]{4}-[0-9]{2}-[0-9]{2}([T ][0-9]{2}:[0-9]{2}(:[0-9]{2}(\.[0-9]+)?)?(Z|[+-][0-9]{2}:?[0-9]{2})?)?')
                AND len(v) >= 10 THEN 'timestamptz'
              WHEN regexp_full_match(v, '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}') THEN 'uuid'
              WHEN regexp_full_match(v, '([0-9a-fA-F]{1,2}:){5}[0-9a-fA-F]{1,2}') THEN 'macaddr'
              WHEN regexp_full_match(v, '((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(/[0-9]{1,2})?')
                OR (len(v) - len(replace(v, ':', '')) >= 2
                    AND regexp_full_match(v, '[0-9a-fA-F:]+(:[0-9a-fA-F]*)+(/[0-9]{1,3})?')) THEN 'inet'
              WHEN starts_with(v, '{') OR starts_with(v, '[{') OR starts_with(v, '[[') THEN 'jsonb'
              ELSE 'varchar'
            END AS mt
          FROM vals
        ), d AS (
          SELECT column_name, v, mt,
            CASE WHEN contains(lower(v), 'e')
              THEN substr(lower(v), 1, position('e' IN lower(v)) - 1) ELSE lower(v) END AS mant
          FROM m
        ), agg AS (
          SELECT column_name,
            max(octet_length(encode(v))) AS sz,
            CASE WHEN count(DISTINCT mt) = 1 THEN min(mt)
                 WHEN bool_and(mt IN ('integer','real')) THEN 'real'
                 WHEN bool_and(mt IN ('integer','boolean')) THEN 'integer'
                 WHEN bool_and(mt IN ('integer','timestamptz')) THEN 'timestamptz'
                 ELSE 'varchar' END AS base_type,
            min(CASE WHEN mt = 'integer' THEN CAST(v AS BIGINT) END) AS nmin,
            max(CASE WHEN mt = 'integer' THEN CAST(v AS BIGINT) END) AS nmax,
            max(CASE WHEN mt IN ('integer','real') THEN
              greatest(1, len(ltrim(replace(replace(mant, '-', ''), '.', ''), '0'))) END) AS maxsig
          FROM d GROUP BY column_name
        ), cols AS (
          SELECT * FROM (VALUES ('event_id'),('ts'),('user_id'),('event_type'),('value'),('props')) t(column_name)
        )
        SELECT c.column_name,
          CASE
            WHEN a.column_name IS NULL THEN 'varchar(5)'
            WHEN a.base_type = 'integer' THEN CASE
              WHEN contains(upper(c.column_name), '_BYTES') THEN 'bigint'
              WHEN (a.nmax >= 1262332800000 AND a.nmax <= 4102444800000 AND a.nmin >= 1262332800000)
                OR a.nmax >= 253406000000000000 THEN 'timestamptz'
              WHEN a.nmin >= -32768 AND a.nmax <= 32767 THEN 'smallint'
              WHEN a.nmin >= -2147483648 AND a.nmax <= 2147483647 THEN 'integer'
              ELSE 'bigint' END
            WHEN a.base_type = 'real' THEN
              CASE WHEN a.maxsig <= 6 THEN 'real' ELSE 'double precision' END
            WHEN a.base_type = 'uuid' THEN
              CASE WHEN a.sz > 36 THEN 'varchar(' || a.sz || ')' ELSE 'uuid' END
            WHEN a.base_type = 'varchar' THEN 'varchar(' || greatest(a.sz, 1) || ')'
            ELSE a.base_type
          END AS pg_type,
          coalesce(a.base_type, 'unknown') AS base_type,
          CAST(coalesce(a.sz, 0) AS BIGINT) AS max_size
        FROM cols c LEFT JOIN agg a ON c.column_name = a.column_name""")))
}
