package graft

import graft.operators.TagStats

class TagStatsSpec extends SparkSpec {
  import spark.implicits._

  test("Q-score routes dense→hct, sparse→rtt, repetitive→lct (writeup.md:243-307)") {
    // 1000 rows: `id` dense+unique, `rare` defined on 5 rows (sparse),
    // `status` dense but 2 distinct values and tiny (repetitive)
    val df = (0 until 1000).map { i =>
      (s"row$i",
        if (i < 5) Some(s"rare-value-$i") else None,
        if (i % 2 == 0) "a" else "b")
    }.toDF("id", "rare", "status")
    val routed = TagStats.classify(TagStats.measure(df, Seq("id", "rare", "status")))
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[String]("route")).toMap
    assert(routed("id") == "hct")     // high-information → main table
    assert(routed("rare") == "rtt")   // sparse (Sp < 0.15) → rare-tag table
    assert(routed("status") == "lct") // dense, low-complexity → repetitive table
  }

  test("stats D/M/U/Ib are exact") {
    val df = Seq(Some("aa"), Some("aa"), Some("bb"), None)
      .toDF("v")
    val s = TagStats.measure(df, Seq("v")).collect().head
    assert(s.getAs[Long]("d") == 3 && s.getAs[Long]("m") == 1)
    assert(s.getAs[Long]("u") == 2 && s.getAs[Long]("ib") == 6)
  }

  test("approx mode: U within 2% of exact, same routing (the 100 TB path)") {
    val df = (0 until 5000).map { i =>
      (s"row$i", s"group${i % 7}", s"val${i % 911}")
    }.toDF("id", "status", "mid")
    val tags = Seq("id", "status", "mid")
    val exact = TagStats.measure(df, tags)
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[Long]("u")).toMap
    val approx = TagStats.measure(df, tags, approx = true)
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[Long]("u")).toMap
    tags.foreach { t =>
      val err = math.abs(approx(t) - exact(t)).toDouble / exact(t)
      assert(err <= 0.02, s"$t: approx=${approx(t)} exact=${exact(t)} err=$err")
    }
    val routeExact = TagStats.classify(TagStats.measure(df, tags))
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[String]("route")).toMap
    val routeApprox = TagStats.classify(TagStats.measure(df, tags, approx = true))
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[String]("route")).toMap
    assert(routeExact == routeApprox)
  }

  test("footer helpers: row count, column-stats max, and the no-stats None") {
    import graft.table.LakeTable
    import spark.implicits._
    val dir = tmpDir("footer-helpers")
    Seq((7L, "a"), (3L, "bb"), (11L, "c"), (5L, "dd"))
      .toDF("event_id", "s").repartition(2)
      .write.mode("overwrite").parquet(dir)
    val p = java.nio.file.Paths.get(dir)
    assert(LakeTable.flatFooterRowCount(p) == 4L)
    // long column: max comes straight from the chunk statistics
    assert(LakeTable.footerLongMax(p, "event_id").contains(11L))
    // a non-long column's stats are not a usable long max -> None
    // (callers must fall back to a real aggregate)
    assert(LakeTable.footerLongMax(p, "s").isEmpty)
    // absent column / absent path -> None, and a single FILE works too
    assert(LakeTable.footerLongMax(p, "nope").isEmpty)
    assert(LakeTable.footerLongMax(p.resolve("does-not-exist"), "event_id").isEmpty)
    val part = java.nio.file.Files.list(p).iterator()
    val one = Iterator.continually(part).takeWhile(_ => part.hasNext)
      .map(_.next()).find(_.getFileName.toString.endsWith(".parquet")).get
    assert(LakeTable.footerLongMax(one, "event_id").isDefined)
  }
}
