package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator from SURVEY.md §2 is exposed as a named query with a
  * DuckDB-runnable oracle where the semantics are SQL-expressible.
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ JsonQueries.defs ++ CdcQueries.defs ++
      PowerQueries.defs ++ TextQueries.defs ++ InferQueries.defs ++
      MlQueries.defs ++ StatQueries.defs ++ ConvQueries.defs ++
      InferJsonQueries.defs ++ DumpQueries.defs

  /** Flagship: full CDC replay through the real engine on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.find(_.name == "q15_cdc_replay_engine").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
