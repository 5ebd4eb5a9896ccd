package graft

import graft.sinks.TsvSink
import graft.types.TypeState

class TsvSinkSpec extends SparkSpec {
  import spark.implicits._

  // typestates as the inference stage would produce them
  private val types = Map(
    "id" -> TypeState("tmp", "integer", 4, 0, 1, 9999, 4, 0),
    "mtime" -> TypeState("tmp", "integer", 13, 0,
      1394496000000L, 1394496002000L, 13, 0), // epoch window → timestamptz
    "ip" -> TypeState("tmp", "inet", 10, 0, 0, 0, 0, 0),
    "mac" -> TypeState("tmp", "macaddr", 15, 0, 0, 0, 0, 0),
    "ok" -> TypeState("tmp", "boolean", 5, 0, 0, 0, 0, 0),
    "tags" -> TypeState("tmp", "varchar", 5, 3, 0, 0, 0, 0), // varchar ARRAY
    "note" -> TypeState("tmp", "varchar", 40, 0, 0, 0, 0, 0))

  test("typed TSV rendering matches the reference's json_tsv behaviors (golden)") {
    val df = Seq(
      ("17", "1394496000000", "3232235777", "1250999896491", "TRUE",
        """["a","b"]""", "plain"),
      ("18", null, "16909060", "0", "F", "[]", "tab\there"),
      ("19", "null", "4294967295", "255", "false", """["x"]""", "back\\slash"))
      .toDF("id", "mtime", "ip", "mac", "ok", "tags", "note")
    val lines = TsvSink.render(df, types)
      .collect().map(_.getString(0)).sorted
    val expected = Seq(
      // epoch→ISO (fromIntTime), bigint→dotted IP (192.168.1.1),
      // bigint→MAC (01:23:45:67:89:ab), TRUE→t, JSON array→PG literal
      "17\t2014-03-11T00:00:00.000Z\t192.168.1.1\t01:23:45:67:89:ab\tt\t{a,b}\tplain",
      // null → \N; empty array is a null form; F→f; 1.2.3.4; all-zero MAC;
      // TAB escaped
      "18\t\\N\t1.2.3.4\t00:00:00:00:00:00\tf\t\\N\ttab\\there",
      // "null" text is a null form; broadcast IP; ff MAC byte; backslash escaped
      "19\t\\N\t255.255.255.255\t00:00:00:00:00:ff\tf\t{x}\tback\\\\slash"
    ).sorted
    assert(lines.toSeq == expected,
      lines.zip(expected).map { case (a, b) => s"\n got: $a\nwant: $b" }.mkString)
  }

  test("write emits COPY-ready shards; round-trip count preserved") {
    val df = (1 to 100).map(i => (i.toString, s"note $i"))
      .toDF("id", "note")
    val dir = tmpDir("tsv-out")
    TsvSink.write(df, types, dir)
    val back = spark.read.text(dir)
    assert(back.count() == 100)
    assert(back.collect().forall(_.getString(0).count(_ == '\t') == 1))
  }

  test("A7 summary CSV: headered single file of the tag stats") {
    val df = Seq(("a", Some("x")), ("b", None), ("a", Some("y")))
      .toDF("k", "v")
    val dir = tmpDir("a7-csv")
    graft.operators.TagStats.writeSummaryCsv(
      graft.operators.TagStats.measure(df, Seq("k", "v")), dir)
    val lines = spark.read.text(dir).collect().map(_.getString(0))
    assert(lines.exists(_.startsWith("tag,d,m,u,ib")), lines.mkString("|"))
    assert(lines.length == 3) // header + 2 tags
  }
}
