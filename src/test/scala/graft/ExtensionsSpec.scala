package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.CdcApply
import graft.model.Corpus
import graft.table.LakeTable

/** The SQL facade: GraftExtensions registers the native expressions as
  * SQL functions and resolves `graft`.`<path>` to lake-table reads. */
class ExtensionsSpec extends SparkSpec {

  private def withExtSession(f: SparkSession => Unit): Unit = {
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions()(_))
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setActiveSession)
      prev.foreach(SparkSession.setDefaultSession)
    }
  }

  test("native expressions are callable from spark.sql") {
    withExtSession { s =>
      val r = s.sql(
        """SELECT graft_simhash64('hello world') AS sh,
          |       graft_md5_simhash60('hello') AS mh,
          |       graft_jsonb_contains('{"a": {"b": 1}}', '{"a": {}}') AS c1,
          |       graft_jsonb_contains('{"a": 1}', '{"b": 1}') AS c2,
          |       graft_minhash_sig(array('a','b'), 4) AS sig,
          |       graft_image_meta(graft_synth_image(20, 10, 'png')) AS meta
          |""".stripMargin).head()
      assert(r.getLong(0) ==
        graft.functions.SimHash64Expr.simhash(
          org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
      assert(r.getLong(1) ==
        graft.functions.Md5SimHash60Expr.simhash(
          org.apache.spark.unsafe.types.UTF8String.fromString("hello")))
      assert(r.getBoolean(2) && !r.getBoolean(3))
      assert(r.getSeq[Long](4).length == 4)
      val meta = r.getStruct(5)
      assert(meta.getAs[Int]("width") == 20 && meta.getAs[Int]("height") == 10 &&
        meta.getAs[String]("format") == "png")
    }
  }

  test("graft.`path` resolves to the lake table's latest snapshot in SQL") {
    val dir = tmpDir("sqlfacade")
    val table = new LakeTable(dir, numBuckets = 8)
    val events = Corpus.changeEvents(spark, 1500, nConvs = 30, maxTurns = 8)
    CdcApply.applyBatch(spark, table, events)
    withExtSession { s =>
      val viaSql = s.sql(s"SELECT conv_id, turn_idx, role, text FROM graft.`$dir`")
      val expected = table.read(s).select("conv_id", "turn_idx", "role", "text")
      assertSameRows(viaSql, expected)
      // predicates and aggregates compose like any relation
      val n = s.sql(
        s"SELECT count(*) AS n FROM graft.`$dir` WHERE turn_idx = 0").head().getLong(0)
      assert(n == expected.where(col("turn_idx") === 0).count())
      // and the filter reaches the parquet scan (pushdown survives the
      // facade — the injected plan is the ordinary pruned parquet union)
      val plan = s.sql(
        s"SELECT text FROM graft.`$dir` WHERE conv_id = 'conv00000001'")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("conv_id"),
        s"no pushdown in facade plan:\n$plan")
    }
  }

  test("SQL facade sees merge-on-read deltas and tombstones correctly") {
    import spark.implicits._
    val dir = tmpDir("sqlfacade2")
    val table = new LakeTable(dir, numBuckets = 8)
    val events = Corpus.changeEvents(spark, 1000, nConvs = 20, maxTurns = 6)
    CdcApply.applyBatch(spark, table, events)
    def ev(txid: Long, op: String, conv: String, text: String) =
      Seq((txid, op, s"e$txid", conv, 0,
        if (op == "delete") null else "user",
        if (op == "delete") null else text,
        null: String,
        if (op == "delete") null: java.sql.Timestamp
        else java.sql.Timestamp.valueOf("2014-03-12 00:00:00")))
        .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    // a delta-path update and a delta-path delete
    CdcApply.applyBatch(spark, table, ev(100001, "update", "conv00000001", "patched"))
    CdcApply.applyBatch(spark, table, ev(100002, "delete", "conv00000002", ""))
    assert(table.currentCommit().get.deltaFiles.nonEmpty)
    withExtSession { s =>
      val got = s.sql(
        s"""SELECT text FROM graft.`$dir`
           |WHERE conv_id = 'conv00000001' AND turn_idx = 0""".stripMargin)
        .head().getString(0)
      assert(got == "patched", "delta row not resolved through SQL facade")
      val gone = s.sql(
        s"""SELECT count(*) AS n FROM graft.`$dir`
           |WHERE conv_id = 'conv00000002' AND turn_idx = 0""".stripMargin)
        .head().getLong(0)
      assert(gone == 0L, "tombstone visible through SQL facade")
    }
  }

  test("@vN suffix pins a past snapshot in SQL (VERSION AS OF)") {
    import spark.implicits._
    val dir = tmpDir("sqltt")
    val table = new LakeTable(dir, numBuckets = 4)
    def ev(txid: Long, text: String) =
      Seq((txid, "update", s"e$txid", "c1", 0, "user", text, null: String,
        java.sql.Timestamp.valueOf("2014-03-12 00:00:00")))
        .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    CdcApply.applyBatch(spark, table, ev(1, "first"))
    CdcApply.applyBatch(spark, table, ev(2, "second"))
    withExtSession { s =>
      val v1 = s.sql(s"SELECT text FROM graft.`$dir@v1`").head().getString(0)
      val head = s.sql(s"SELECT text FROM graft.`$dir`").head().getString(0)
      assert(v1 == "first" && head == "second")
      // outside the retained window → the readVersion refusal surfaces
      val err = intercept[Exception](s.sql(s"SELECT * FROM graft.`$dir@v99`").collect())
      assert(err.getMessage.contains("not in the retained commit log"))
    }
  }
}
