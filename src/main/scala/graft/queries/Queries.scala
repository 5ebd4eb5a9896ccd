package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One driver-checkable query: a Spark plan + (optionally) the ANSI SQL
  * a DuckDB oracle runs over the same parquet tables. Column names and
  * types must match exactly (floats go through DECIMAL so the two
  * engines' aggregation order can't produce differing bits).
  */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** Relational operator coverage over the driver's TPC-H-ish tables —
  * the query shapes the reference delegates to PostgreSQL
  * (/root/reference/jsonbQdemo/powerschemaquery.md:377-657) plus the
  * scan/filter/agg/dedup/sort operators of SURVEY.md §2.
  *
  * Scale notes: aggregations are partial+final (map-side combine) by
  * construction; joins to dimension tables broadcast (nation/region/
  * customer are tiny relative to facts); filters and projections reach
  * the parquet scan (verified via explain in BenchSpec).
  */
object RelationalQueries {
  import Tables.t
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def money(c: Column): Column = c.cast("double")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q01_pricing_agg",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          money(sum(dec(col("l_quantity")))).as("sum_qty"),
          money(sum(dec(col("l_extendedprice")))).as("sum_price"),
          money(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("sum_disc_price"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    QueryDef("q02_filter_pushdown",
      (s, d) => t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(money(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))).as("revenue"),
          count(lit(1)).as("n")),
      Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        count(*) AS n FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),

    QueryDef("q03_join_agg",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_mktsegment")
        .agg(money(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("revenue"),
          count(lit(1)).as("n_lines")),
      Some("""SELECT c_mktsegment,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        count(*) AS n_lines
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey GROUP BY c_mktsegment""")),

    QueryDef("q04_dim_broadcast_join",
      (s, d) => t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"), money(sum(dec(col("c_acctbal")))).as("sum_bal")),
      Some("""SELECT r_name, count(*) AS n_cust,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey GROUP BY r_name""")),

    QueryDef("q05_topk",
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), money(dec(col("o_totalprice"))).as("price")),
      Some("""SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),

    QueryDef("q06_distinct",
      (s, d) => t(s, d, "orders").select("o_orderstatus", "o_orderpriority").distinct(),
      Some("SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders")),

    QueryDef("q07_union_by_year",
      (s, d) => {
        val o = t(s, d, "orders")
        val a = o.where(year(col("o_orderdate")) === 1996)
        val b = o.where(year(col("o_orderdate")) === 1998)
        a.unionByName(b).groupBy(year(col("o_orderdate")).cast("int").as("yr"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, count(*) AS n FROM (
        SELECT * FROM orders WHERE year(o_orderdate) = 1996
        UNION ALL SELECT * FROM orders WHERE year(o_orderdate) = 1998) GROUP BY 1""")),

    QueryDef("q08_anti_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").where(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""")),

    QueryDef("q09_semi_join",
      (s, d) => t(s, d, "part")
        .join(t(s, d, "lineitem"), col("p_partkey") === col("l_partkey"), "left_semi")
        .groupBy("p_brand").agg(count(lit(1)).as("n_parts")),
      Some("""SELECT p_brand, count(*) AS n_parts FROM part
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        GROUP BY p_brand""")),

    QueryDef("q10_window_latest_order",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"),
            money(dec(col("o_totalprice"))).as("price"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1""")),

    QueryDef("q11_window_rank_value",
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id").asc)
        t(s, d, "events")
          .withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 3)
          .select("event_type", "rnk", "event_id", "value")
      },
      Some("""SELECT event_type, rnk, event_id, value FROM (
        SELECT event_type, event_id, value,
          row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rnk
        FROM events) WHERE rnk <= 3""")))
}

/** The JSONB query surface (reference F15,
  * /root/reference/jsonbQdemo/jsonbquery.md:224-306): path extraction,
  * path+CAST filters, containment-style equality. */
object JsonQueries {
  import Tables.t
  val defs: Seq[QueryDef] = Seq(
    QueryDef("q12_json_extract_agg",
      (s, d) => t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"),
          sum(col("k").cast("long")).as("sum_k")),
      Some("""SELECT event_type, count(*) AS n,
        max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type""")),

    QueryDef("q13_json_path_filter",
      (s, d) => t(s, d, "events")
        .where(get_json_object(col("props"), "$.k").cast("int").between(10, 20))
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k")),
      Some("""SELECT event_id, event_type,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) BETWEEN 10 AND 20""")))
}
