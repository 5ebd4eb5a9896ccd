package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.types.{InferTypes, TypeInference, TypeState}

/** Pure-lattice unit tests (no Spark) — every behavior cited from the
  * reference and FIXTURES.md §3-§5. */
class TypeLatticeSpec extends AnyFunSuite {
  import TypeInference._

  test("typeThatWins lattice cells (json2pgtypes.js:613-643)") {
    assert(typeThatWins("real", "integer") == "real")
    assert(typeThatWins("integer", "real") == "real")
    assert(typeThatWins("boolean", "integer") == "integer")
    assert(typeThatWins("timestamptz", "integer") == "timestamptz")
    assert(typeThatWins("uuid", "integer") == "varchar")
    assert(typeThatWins("varchar", "jsonb") == "varchar")
    assert(typeThatWins("jsonb", "jsonb") == "jsonb")
    assert(typeThatWins("unknown", "uuid") == "uuid")
  }

  test("matchType classification (json2pgtypes.js:648-894)") {
    assert(matchType("TRUE") == "boolean" && matchType("f") == "boolean")
    assert(matchType("1") == "integer" && matchType("0") == "integer")
    assert(matchType("007") == "varchar") // leading-zero guard
    assert(matchType("-12.5") == "real" && matchType("1.2e-3") == "real")
    assert(matchType("2014-03-20T19:21:33.489Z") == "timestamptz")
    assert(matchType("2014-03-20") == "timestamptz")
    assert(matchType("0aa9f6a8-1b0b-11e4-9b67-77c07ffca8c6") == "uuid")
    assert(matchType("aa:bb:cc:dd:ee:ff") == "macaddr")
    assert(matchType("172.25.10.11") == "inet")
    assert(matchType("172.25.10.11/24") == "inet")
    assert(matchType("""{"a":1}""") == "jsonb")
    assert(matchType("""[{"a":1}]""") == "jsonb")
    assert(matchType("[[1,2],[3]]") == "jsonb")
    assert(matchType("hello world") == "varchar")
  }

  test("boolean validates 0/1 but never matches them (json2pgtypes.js:329-342)") {
    assert(validateType("boolean", "0") && validateType("boolean", "1"))
    assert(matchType("0") != "boolean")
  }

  test("null forms are ignored (json2pgtypes.js:139-148)") {
    val st = Seq("null", "", "\\N", "[\"\"]", "{}", "[]", "NaN", "default")
      .foldLeft(TypeState())(update)
    assert(st.status == "unk" && st.tpe == "unknown")
  }

  test("streaming promotion: integer → real → varchar (json2pgtypes.js:1064-1090)") {
    val st1 = Seq("1", "2", "3").foldLeft(TypeState())(update)
    assert(st1.tpe == "integer")
    val st2 = update(st1, "2.5")
    assert(st2.tpe == "real")
    val st3 = update(st2, "abc")
    assert(st3.tpe == "varchar")
  }

  test("epoch-millis integers finalize to timestamptz (outputpgtypes.js:94-109)") {
    val st = Seq("1394567890123", "1494567890123").foldLeft(TypeState())(update)
    assert(toPgType("_mtime", st) == "timestamptz")
    // ufds sentinel
    val st2 = update(TypeState(), "253406000000000001")
    assert(toPgType("passwdendtime", st2) == "timestamptz")
    // pre-2010 stays bigint
    val st3 = Seq("1", "1394567890123").foldLeft(TypeState())(update)
    assert(toPgType("x", st3) == "bigint")
  }

  test("integer sizing smallint/integer/bigint (outputpgtypes.js:76-118)") {
    assert(toPgType("a", Seq("1", "-3").foldLeft(TypeState())(update)) == "smallint")
    assert(toPgType("a", Seq("70000").foldLeft(TypeState())(update)) == "integer")
    assert(toPgType("a", Seq("9000000000").foldLeft(TypeState())(update)) == "bigint")
    assert(toPgType("file_BYTES", Seq("1").foldLeft(TypeState())(update)) == "bigint")
  }

  test("real sizing by sigfigs; money under flag (outputpgtypes.js:147-185)") {
    assert(toPgType("a", update(TypeState(), "1.25")) == "real")
    assert(toPgType("a", update(TypeState(), "123456.789")) == "double precision")
    assert(toPgType("a", update(TypeState(), "10.99"), money = true) == "money")
  }

  test("uuid demoted to varchar when size > 36 (outputpgtypes.js:186-193)") {
    val ok = update(TypeState(), "0aa9f6a8-1b0b-11e4-9b67-77c07ffca8c6")
    assert(toPgType("u", ok) == "uuid")
    val bad = update(ok, "0aa9f6a8-1b0b-11e4-9b67-77c07ffca8c6-extra")
    assert(toPgType("u", bad).startsWith("varchar("))
  }

  test("all-null column → varchar(5) via unknown_min_size (outputpgtypes.js:236-247)") {
    assert(toPgType("n", TypeState()) == "varchar(5)")
  }

  test("arrays: element typing, multi-element ARRAY, singleton unwrap (FIXTURES §4)") {
    val multi = update(TypeState(), """["0aa9f6a8-1b0b-11e4-9b67-77c07ffca8c6", "1aa9f6a8-1b0b-11e4-9b67-77c07ffca8c6"]""")
    assert(toPgType("uuid_array", multi) == "uuid ARRAY")
    val single = update(TypeState(), """["0aa9f6a8-1b0b-11e4-9b67-77c07ffca8c6"]""")
    assert(toPgType("uuid_array_1", single) == "uuid")
    val mixed = update(TypeState(), "[1, 2.5]")
    assert(toPgType("real_array", mixed) == "real ARRAY")
    val epochArr = update(TypeState(), "[1394567890123, 1394567890124]")
    assert(toPgType("itime_array", epochArr) == "timestamptz ARRAY")
    val jsonArr = update(TypeState(), """[{"a":1},{"a":2}]""")
    assert(toPgType("json_array", jsonArr) == "jsonb")
  }

  test("merge semantics: pgtypes_reduce golden behaviors (pgtypes_reduce.js:162-277)") {
    // tmp beats unk
    val t = update(TypeState(), "42")
    assert(TypeInference.merge(TypeState(), t) == t)
    // varchar wins
    assert(TypeInference.merge(update(TypeState(), "abc"), t).tpe == "varchar")
    // real beats int
    assert(TypeInference.merge(update(TypeState(), "1.5"), t).tpe == "real")
    // bigint + timestamptz → timestamptz with widened bounds (e.g. _mtime)
    val big = update(TypeState(), "1394567890123")
    val iso = update(TypeState(), "2014-03-20T19:21:33.489Z")
    assert(TypeInference.merge(big, iso).tpe == "timestamptz")
  }

  test("merge is commutative, associative, idempotent (monoid — distributed-safe)") {
    val vocab = Vector("1", "2.5", "TRUE", "abc", "2014-03-20", "1394567890123",
      "0aa9f6a8-1b0b-11e4-9b67-77c07ffca8c6", """{"a":1}""", "[1,2]",
      "aa:bb:cc:dd:ee:ff", "10.0.0.1", "-77", "1e9", "007", "null", "9000000000")
    val rnd = new scala.util.Random(42)
    def randomState(): TypeState =
      (0 until rnd.nextInt(6)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .foldLeft(TypeState())(update)
    (1 to 500).foreach { _ =>
      val (a, b, c) = (randomState(), randomState(), randomState())
      assert(TypeInference.merge(a, b) == TypeInference.merge(b, a))
      assert(TypeInference.merge(TypeInference.merge(a, b), c) ==
        TypeInference.merge(a, TypeInference.merge(b, c)))
      assert(TypeInference.merge(a, a) == a)
      assert(TypeInference.merge(a, TypeState()) == a)
    }
  }

  test("fold order does not change the outcome (streaming == batch)") {
    val vals = Seq("1", "2.5", "1394567890123", "abc", "TRUE", "[1,2]")
    val fwd = vals.foldLeft(TypeState())(update)
    val rev = vals.reverse.foldLeft(TypeState())(update)
    assert(fwd.copy(maxSigFigs = 0) == rev.copy(maxSigFigs = 0) ||
      toPgType("x", fwd) == toPgType("x", rev))
  }
}

/** Distributed inference through the Spark Aggregator — the triage
  * fixture of FIXTURES.md §3 (golden DDL proven by the reference's
  * test/json2pgtypes_test1.sql). */
class InferTypesSpec extends SparkSpec {
  import spark.implicits._

  test("golden DDL: triage fixture column behaviors (FIXTURES §3)") {
    val rows = Seq(
      ("17", "TRUE", "0aa9f6a8-1b0b-11e4-9b67-77c07ffca8c6", "54CF80C5", "123",
        "1.2345678", "varchar99", "2014-03-20T19:21:33.489Z", "null", "",
        "1394567890123", "17", "10.0.0.1/16", "aa:bb:cc:dd:ee:ff", """{"a": 1}"""),
      ("-3", "f", "1aa9f6a8-1b0b-11e4-9b67-77c07ffca8c6", "00FF80C5", "99",
        "2.5", "varchar9", "2014-03-21T19:21:33.489Z", "null", "null",
        "1494567890123", "1", "192.168.0.1", "00:0a:95:9d:68:16", """[{"b": 2}]"""))
      .toDF("SMALLINT_1", "BOOLEAN", "UUID_1", "HEX_8Char", "SMALLINT_2",
        "DOUBLE", "VARCHAR9", "TIMESTAMPZ", "NULLCOL", "EMPTYSTRING",
        "BIGINT_2", "SMALLINT_3", "INET", "MACADDR", "JSONB_1")
    val states = InferTypes.inferTable(rows, rows.columns.toSeq)
    def pg(c: String) = TypeInference.toPgType(c, states(c))
    assert(pg("SMALLINT_1") == "smallint")
    assert(pg("BOOLEAN") == "boolean")
    assert(pg("UUID_1") == "uuid")
    assert(pg("HEX_8Char") == "varchar(8)")
    assert(pg("SMALLINT_2") == "smallint")
    assert(pg("DOUBLE") == "double precision")
    assert(pg("VARCHAR9") == "varchar(9)")
    assert(pg("TIMESTAMPZ") == "timestamptz")
    assert(pg("NULLCOL") == "varchar(5)")
    assert(pg("EMPTYSTRING") == "varchar(5)")
    assert(pg("BIGINT_2") == "timestamptz") // epoch window promotion
    assert(pg("SMALLINT_3") == "smallint")
    assert(pg("INET") == "inet")
    assert(pg("MACADDR") == "macaddr")
    assert(pg("JSONB_1") == "jsonb")
  }

  test("inference over a real table is one aggregate pass and deterministic") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val ddl1 = InferTypes.inferDdl(ev, "events")
    val ddl2 = InferTypes.inferDdl(ev.repartition(7), "events")
    assert(ddl1 == ddl2) // partitioning-independent (monoid merge)
    // event_id 0..999 at sf0.001 → sized to smallint, like the reference
    assert(ddl1.contains("event_id smallint"))
    assert(ddl1.contains("props jsonb"))
    assert(ddl1.contains("event_type varchar(8)"))
    assert(ddl1.contains("value real") || ddl1.contains("value double precision"))
  }
}
