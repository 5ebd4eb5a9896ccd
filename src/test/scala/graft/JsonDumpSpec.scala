package graft

import org.apache.spark.sql.functions._

import graft.functions.JsonContainsExpr
import graft.operators.{PowerSchema, TableManifest}
import graft.sources.MorayDump

class JsonDumpSpec extends SparkSpec {

  // Truth table verified against DuckDB json_contains (the driver's
  // oracle engine) and PostgreSQL @> semantics (the reference's query
  // surface, jsonbquery.md:270-306). Rows where the two engines differ
  // on exotic nesting are intentionally absent — queries only use
  // shapes both agree on.
  private val battery: Seq[(String, String, Boolean)] = Seq(
    ("""{"k": 7}""", """{"k": 7}""", true),
    ("""{"k": 7, "j": 1}""", """{"k": 7}""", true),
    ("""{"k": 7}""", """{"k": 7.0}""", false), // strict numeric token
    ("""{"k": "7"}""", """{"k": 7}""", false), // string ≠ number
    ("""{"a": {"b": 1, "c": [1,2]}, "d": 5}""", """{"a": {"c": [2]}}""", true),
    ("""{"a": [1, {"x": 2}]}""", """{"a": [{"x": 2}]}""", true),
    ("""{"a": [1,2]}""", """{"a": 2}""", false), // structure must match
    ("""{"a": [1,2]}""", """{"a": [2]}""", true),
    ("""{"a": [1,2]}""", """{"a": []}""", true),
    ("""{"a": {"b": [1,2,3]}}""", """{"a": {"b": [3,1]}}""", true),
    ("""{"a": 1, "b": 2}""", """{}""", true),
    ("""{"a": "x"}""", """{"a": "x", "b": null}""", false),
    ("""{"a": null}""", """{"a": null}""", true),
    ("""[1,2,3]""", """2""", true), // top-level primitive-in-array
    ("""[1,2]""", """[2,2,2]""", true),
    ("""[1]""", """[[1]]""", false),
    ("""{"a":[1,2]}""", """{"a":[[1]]}""", false),
    ("""{"meta":{"type":"click","tags":["k7","u3"]},"k":7}""",
      """{"meta":{"tags":["k7"]}}""", true),
    ("""{"meta":{"type":"click","tags":["k7","u3"]},"k":7}""",
      """{"k":7,"meta":{"type":"click"}}""", true),
    ("""{"meta":{"type":"click","tags":["k7","u3"]},"k":7}""",
      """{"meta":{"tags":["u9"]}}""", false),
    ("""3""", """3""", true),
    ("""3""", """3.0""", false),
    ("""true""", """true""", true),
    ("""null""", """null""", true),
    ("""not json""", """{}""", false)) // permissive: unparseable → false

  test("jsonb containment truth table (PG/DuckDB semantics)") {
    battery.foreach { case (h, n, expected) =>
      assert(JsonContainsExpr.contains(h, n) == expected,
        s"$h @> $n should be $expected")
    }
  }

  test("jsonb containment runs as a codegen'd column filter") {
    import spark.implicits._
    val df = Seq(
      ("""{"a": {"t": ["x","y"]}, "n": 1}""", 1),
      ("""{"a": {"t": ["z"]}, "n": 2}""", 2)).toDF("doc", "id")
    val out = df.where(JsonContainsExpr.jsonContains(col("doc"),
      lit("""{"a": {"t": ["x"]}}"""))).select("id").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1))
    val plan = df.where(JsonContainsExpr.jsonContains(col("doc"), lit("{}")))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"), s"UDF in plan:\n$plan")
  }

  test("moray dump: header+entry round-trip preserves rows and positions") {
    import spark.implicits._
    val df = Seq(
      ("17", "k1", "54CF80C5", "1394567890123", """{"exec":"ok","n":1}"""),
      ("18", "k2", "64CF80C6", "1394567890124", """{"exec":"fail","n":2}"""))
      .toDF("_id", "_key", "_etag", "_mtime", "_value")
    val dir = tmpDir("dump-rt")
    MorayDump.dumpLines(df, "wf_jobs").coalesce(1).write.mode("overwrite").text(dir)
    val back = MorayDump.readDump(spark, dir)
    assert(back.columns.toSeq ==
      Seq("_id", "_key", "_etag", "_mtime", "_value", "_table"))
    assert(back.select("_table").distinct().head().getString(0) == "wf_jobs")
    assertSameRows(back.drop("_table"), df)
  }

  test("moray dump: split shards each carry the replicated header (S5)") {
    import spark.implicits._
    val df = (0 until 100).map(i =>
      (i.toString, s"key$i", f"$i%08X", s"$i", s"""{"v":$i}"""))
      .toDF("_id", "_key", "_etag", "_mtime", "_value")
    val dir = tmpDir("dump-shards")
    // 4 shards, header in each (manta/dc_inputs.sh:49-60 semantics)
    (0 until 4).foreach { shard =>
      MorayDump.dumpLines(
        df.where(pmod(col("_id").cast("int"), lit(4)) === shard), "events")
        .coalesce(1).write.mode("overwrite").text(s"$dir/shard$shard")
    }
    val back = MorayDump.readDump(spark, dir)
    assert(back.count() == 100)
    assert(back.select(sum(col("_id").cast("long"))).head().getLong(0) == 4950L)
  }

  test("moray dump: multi-bucket dir resolves by bucket name via file headers") {
    import spark.implicits._
    val a = Seq(("1", """{"x":1}""")).toDF("_id", "_value")
    val b = Seq(("2", "extra", """{"y":2}""")).toDF("_id", "_custom", "_value")
    val dir = tmpDir("dump-multi")
    MorayDump.dumpLines(a, "bucketA").coalesce(1).write.mode("overwrite").text(s"$dir/a")
    MorayDump.dumpLines(b, "bucketB").coalesce(1).write.mode("overwrite").text(s"$dir/b")
    val backA = MorayDump.readDump(spark, dir, bucket = Some("bucketA"))
    val backB = MorayDump.readDump(spark, dir, bucket = Some("bucketB"))
    assert(backA.count() == 1 && backA.columns.contains("_value"))
    assert(backB.count() == 1 && backB.columns.contains("_custom"))
    intercept[IllegalArgumentException] { MorayDump.readDump(spark, dir) }
  }

  test("moray dump: mid-file header (concatenated shard) falls back to the full scan") {
    import spark.implicits._
    val a = Seq(("1", """{"x":1}""")).toDF("_id", "_value")
    val b = Seq(("2", "extra", """{"y":2}""")).toDF("_id", "_custom", "_value")
    val dir = tmpDir("dump-midhdr")
    // file A: normal shard, header on line 1
    MorayDump.dumpLines(a, "bucketA").coalesce(1).write.mode("overwrite").text(s"$dir/a")
    // file B: a concatenation artifact — a stray blank-ish line BEFORE
    // the header, so the first-line fast path cannot explain this file
    val bLines = MorayDump.dumpLines(b, "bucketB").as[String].collect()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/b"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/b/part-00000.txt"),
      ("{}\n" + bLines.mkString("\n") + "\n").getBytes("UTF-8"))
    // a partial fast-path result must NOT be treated as authoritative:
    // bucketB exists (header mid-file) and must resolve correctly...
    val backB = MorayDump.readDump(spark, dir, bucket = Some("bucketB"))
    assert(backB.count() == 1 && backB.columns.contains("_custom"))
    assert(backB.head.getAs[String]("_custom") == "extra")
    // ...and an unqualified read of the two-bucket dir must still raise
    intercept[IllegalArgumentException] { MorayDump.readDump(spark, dir) }
    val backA = MorayDump.readDump(spark, dir, bucket = Some("bucketA"))
    assert(backA.count() == 1 && !backA.columns.contains("_custom"))
  }

  test("moray dump feeds PowerSchema.split end-to-end (reference wf shape)") {
    import spark.implicits._
    val rows = (0 until 50).map { i =>
      (s"$i", f"uuid-$i%04d", f"$i%08X", s"${1394567890000L + i}",
        s"""{"name":"job$i","execution":"${if (i % 2 == 0) "succeeded" else "failed"}","worker":"w${i % 3}"}""")
    }.toDF("_id", "_key", "_etag", "_mtime", "_value")
    val dir = tmpDir("dump-power")
    MorayDump.dumpLines(rows, "wf_jobs").coalesce(1).write.mode("overwrite").text(dir)
    val dump = MorayDump.readDump(spark, dir)
    // S3: explode _value fields next to the Moray system columns
    val flat = dump.select(col("_etag"), col("_mtime"),
      get_json_object(col("_value"), "$.name").as("name"),
      get_json_object(col("_value"), "$.execution").as("execution"),
      get_json_object(col("_value"), "$.worker").as("worker"))
    val m = TableManifest("wf_jobs", pk = "_etag",
      hct = Seq("_etag", "_mtime", "name"),
      lct = Seq("execution", "worker"),
      rtt = Seq("name"))
    val (mm, rr, ss) = PowerSchema.split(flat, m)
    assert(mm.count() == 50)
    assert(rr.count() == 6) // 2 executions × 3 workers
    assert(ss.count() == 50)
    // FK integrity: every _m._r_id resolves
    assert(mm.join(rr, Seq("_r_id"), "left_anti").count() == 0)
  }

  test("reorg precedence: _value key shadows by default, revert restores Moray (P2)") {
    import spark.implicits._
    // three presence cases: key present with a value, key absent,
    // key present with an EXPLICIT null (the reference's membership
    // test never inspects the value, so an explicit null also shadows)
    val df = Seq(
      ("1", "m1", """{"_etag":"v1","extra":"e1"}"""),
      ("2", "m2", """{"extra":"e2"}"""),
      ("3", "m3", """{"_etag":null,"extra":"e3"}""")
    ).toDF("_id", "_etag", "_value")
    val targets = Seq("_etag", "extra")

    val dflt = graft.operators.Reorg.flattenValues(df, targets)
      .orderBy("_id").collect()
    assert(dflt.map(_.getAs[String]("_etag")).toSeq == Seq("v1", "m2", null))
    assert(dflt.map(_.getAs[String]("extra")).toSeq == Seq("e1", "e2", "e3"))

    val rev = graft.operators.Reorg.flattenValues(df, targets, revert = true)
      .orderBy("_id").collect()
    assert(rev.map(_.getAs[String]("_etag")).toSeq == Seq("m1", "m2", "m3"))
    assert(rev.map(_.getAs[String]("extra")).toSeq == Seq("e1", "e2", "e3"))

    // _value is consumed; _id carries through; targets appear once
    assert(dflt.head.schema.fieldNames.toSeq == Seq("_id", "_etag", "extra"))
  }
}
