package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

import graft.table.LakeTable
import graft.cdc.CdcApply
import graft.model.Corpus

/** Physical-plan quality gates: these queries must keep the plan shapes
  * that make them viable at 100 TB — filters pushed into the parquet
  * scan, column pruning, broadcast for dimension joins, partial (map-
  * side) aggregation, whole-stage codegen on the hot path. A regression
  * here is a performance bug even when results stay correct. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val q = SparkEntry.queries(name)
    val df = q(spark, sf)
    df.collect() // materialize so AQE finalizes the physical plan
    df.queryExecution.executedPlan.toString
  }

  /** Expand through AQE plans and query stages (incl. Spark 4's
    * ResultQueryStage): their inner plans are internal state, not
    * children, so a plain .collect stops at them. */
  private def flattenPlan(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => flattenPlan(a.executedPlan)
    case s: QueryStageExec => flattenPlan(s.plan)
    case r: ReusedExchangeExec => flattenPlan(r.child)
    case other => other.children.flatMap(flattenPlan)
  })

  test("q02 filter pushdown reaches the parquet scan") {
    val p = planOf("q02_filter_pushdown")
    assert(p.contains("PushedFilters:") &&
      (p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("l_shipdate")),
      s"no pushed filters:\n$p")
  }

  test("q02 scan is column-pruned (ReadSchema excludes unused columns)") {
    val p = planOf("q02_filter_pushdown")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_extendedprice") && !readSchema.contains("l_orderkey"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("q04 dimension joins are broadcast (no shuffle of the fact side)") {
    val p = planOf("q04_dim_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q01 aggregation is partial+final (map-side combine)") {
    val p = planOf("q01_pricing_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q01 hot path is inside whole-stage codegen") {
    val p = planOf("q01_pricing_agg")
    // "*(n) Operator" marks a whole-stage-codegen span in the simple rendering
    assert(p.contains("WholeStageCodegen") || "\\*\\(\\d+\\) ".r.findFirstIn(p).isDefined,
      s"no codegen spans:\n$p")
  }

  test("lake table point read prunes to one bucket (scan lists one directory)") {
    val table = new LakeTable(tmpDir("planprune"), numBuckets = 16)
    CdcApply.applyBatch(spark, table,
      Corpus.changeEvents(spark, 2000, nConvs = 50, maxTurns = 8))
    val buckets = table.currentCommit().get.buckets
    val oneBucket = buckets.keys.head.toInt
    val pruned = table.readBuckets(spark, Seq(oneBucket))
    val files = pruned.inputFiles
    assert(files.nonEmpty && files.forall(_.contains(s"_bucket=$oneBucket")),
      s"bucket pruning leaked files: ${files.take(3).mkString(",")}")
  }

  test("merge-apply plan: target side scans only touched buckets") {
    val table = new LakeTable(tmpDir("planmerge"), numBuckets = 16)
    val events = Corpus.changeEvents(spark, 2000, nConvs = 50, maxTurns = 8)
    CdcApply.applyBatch(spark, table, events)
    val allBuckets = table.currentCommit().get.buckets.size
    import spark.implicits._
    val one = Seq((99999L, "update", "ee", "conv00000001", 0, "user", "x",
      null: String, java.sql.Timestamp.valueOf("2014-03-12 00:00:00")))
      .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val stats = CdcApply.applyBatch(spark, table, one)
    assert(stats.bucketsTouched == 1 && allBuckets > 1,
      s"merge touched ${stats.bucketsTouched} of $allBuckets buckets")
  }

  test("broadcast merge: the TARGET side is never shuffled (batch-side collapse only)") {
    val table = new LakeTable(tmpDir("planbcast"), numBuckets = 16)
    val events = Corpus.changeEvents(spark, 3000, nConvs = 50, maxTurns = 8)
    CdcApply.applyBatch(spark, table, events.where(col("_txid") <= 2000))
    // capture every query execution during the incremental apply
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.QueryExecution]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    // the steady-state delta write is ONE job: it is allowed to contain
    // the O(batch) winner-collapse exchanges, but NO exchange may sit
    // above a scan of the TABLE's files — at 100 TB that is the line
    // between "read touched buckets at disk bandwidth" and "re-shuffle
    // the table every batch"
    def targetShuffles(p: org.apache.spark.sql.execution.SparkPlan,
        tableLoc: String): Seq[String] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
      import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
      val root = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      root.collect {
        case e: ShuffleExchangeExec if e.treeString.contains(tableLoc) =>
          e.treeString
        case s: ShuffleQueryStageExec if s.plan.treeString.contains(tableLoc) =>
          s.plan.treeString
        case r: ReusedExchangeExec if r.child.isInstanceOf[ShuffleExchangeExec] &&
            r.child.treeString.contains(tableLoc) => r.child.treeString
      }
    }
    spark.listenerManager.register(listener)
    try {
      val s = CdcApply.applyBatch(spark, table, events.where(col("_txid") > 2000))
      assert(s.applied > 0)
      // listener delivery is async — poll for the write-job plan
      import scala.jdk.CollectionConverters._
      def writePlans = plans.iterator().asScala.toSeq.filter { qe =>
        val p = qe.executedPlan.toString
        p.contains("WriteFiles") || p.contains("InsertIntoHadoopFsRelation")
      }
      var tries = 0
      while (writePlans.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val wp = writePlans
      assert(wp.nonEmpty, "no write-job plan captured")
      wp.foreach { qe =>
        // the write job must actually read the table (the gate scan)...
        assert(qe.executedPlan.toString.contains(table.location) ||
          wp.size > 1, s"write plan reads no table files:\n${qe.executedPlan}")
        // ...but never through a shuffle
        val bad = targetShuffles(qe.executedPlan, table.location)
        assert(bad.isEmpty,
          "table scan under a shuffle exchange in the delta write plan:\n" +
            bad.headOption.getOrElse(""))
      }
      // and the steady write moves PAYLOAD through exactly one
      // exchange — the batch's by-bucket hash (the winner groupBy,
      // broadcast gate and writer all keep that layout). The only
      // other exchange permitted is the gate's per-key max-txid
      // aggregation, which is NARROW (merge keys + txid, no payload
      // columns) and O(batch·depth) rows — every other shape (a
      // writer repartition, a table-side shuffle) is a regression.
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val shuffles = wp.flatMap(qe => flattenPlan(qe.executedPlan).distinct
        .collect { case e: ShuffleExchangeExec => e })
      val payloadShuffles = shuffles.filterNot(_.output.length <= 3)
      assert(payloadShuffles.size == 1,
        s"steady delta write has ${payloadShuffles.size} payload-bearing " +
          s"exchanges (want exactly 1: the batch's by-bucket hash):\n" +
          payloadShuffles.map(_.treeString.take(400)).mkString("\n"))
      assert(payloadShuffles.head.outputPartitioning.toString.contains("__bkt"),
        "the one payload exchange is not the by-bucket hash: " +
          payloadShuffles.head.outputPartitioning.toString)
    } finally spark.listenerManager.unregister(listener)
  }

  test("consolidation write reads only delta stacks — never a base file") {
    import spark.implicits._
    val table = new LakeTable(tmpDir("plancons"), numBuckets = 4)
    CdcApply.applyBatch(spark, table,
      Corpus.changeEvents(spark, 2000, nConvs = 50, maxTurns = 8))
    def patch(txid: Long) =
      Seq((txid, "update", s"e$txid", "conv00000001", 0, "user", s"p$txid",
        null: String, java.sql.Timestamp.valueOf("2014-03-12 00:00:00")))
        .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    CdcApply.applyBatch(spark, table, patch(100001), maxDeltaDepth = 2)
    CdcApply.applyBatch(spark, table, patch(100002), maxDeltaDepth = 2)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.QueryExecution]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.add(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // third patch hits the cap with a tiny stack → pure CONSOLIDATION
      val s = CdcApply.applyBatch(spark, table, patch(100003), maxDeltaDepth = 2)
      assert(s.applied == 1)
      val c = table.currentCommit().get
      assert(c.metrics("consolidatedBuckets") == 1L && c.metrics("foldedBuckets") == 0L)
      import scala.jdk.CollectionConverters._
      var tries = 0
      def writePlans = plans.iterator().asScala.toSeq.filter { qe =>
        val p = qe.executedPlan.toString
        p.contains("WriteFiles") || p.contains("InsertIntoHadoopFsRelation")
      }
      while (writePlans.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      assert(writePlans.nonEmpty, "no write-job plan captured")
      // base dirs are data/c<digits>/_bucket=N; delta dirs data/c<digits>d/...
      val baseDir = raw"data/c\d+/_bucket".r
      writePlans.foreach { qe =>
        val p = qe.executedPlan.toString
        assert(baseDir.findFirstIn(p).isEmpty,
          s"consolidation write scans a BASE file (O(stack) promise broken):\n$p")
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("version-gate read scans only (merge keys, _txid) — pruning survives the base∪delta union") {
    val table = new LakeTable(tmpDir("plangate"), numBuckets = 8)
    val ev = Corpus.changeEvents(spark, 3000, nConvs = 50, maxTurns = 8)
    CdcApply.applyBatch(spark, table, ev.where(col("_txid") <= 1500))
    // second apply stacks a delta, so the gate read unions base + delta
    CdcApply.applyBatch(spark, table,
      ev.where(col("_txid") > 1500 && col("_txid") <= 1600))
    assert(table.currentCommit().get.deltaDepth >= 1)
    val gate = table.readBuckets(spark, 0 until 8, resolve = false)
      .select(col("conv_id"), col("turn_idx"), col("_txid"))
    gate.collect()
    val scans = gate.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scans.nonEmpty, "no FileScan in gate plan")
    scans.foreach { l =>
      assert(!l.contains("text") && !l.contains("role") && !l.contains("_etag"),
        s"gate scan reads payload columns: ${l.trim.take(200)}")
    }
  }

  test("point-key read skips row groups (sorted files + min/max pushdown)") {
    // table files are written sorted by (conv_id, turn_idx) inside each
    // task precisely so point/gate reads can skip row groups on footer
    // min/max stats. Force many small row groups, then A/B the parquet
    // scan's output rows with filter pushdown off vs on: the pushed
    // point predicate must eliminate most row groups BEFORE they are
    // materialized (the vectorized reader does no row-level filtering,
    // so scan numOutputRows ≈ rows of surviving row groups).
    val hconf = spark.sparkContext.hadoopConfiguration
    val oldBlock = Option(hconf.get("parquet.block.size"))
    hconf.setInt("parquet.block.size", 32 * 1024)
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val table = new LakeTable(tmpDir("rowskip"), numBuckets = 1)
      CdcApply.applyBatch(spark, table,
        Corpus.changeEvents(spark, 40000, nConvs = 2000, maxTurns = 10),
        pruneBuckets = false)
      val key = table.read(spark).select("conv_id").head().getString(0)
      def scannedRows(pushdown: Boolean): (Long, String) = {
        spark.conf.set("spark.sql.parquet.filterPushdown", pushdown)
        val df = table.read(spark).where(col("conv_id") === key)
        df.collect()
        val scans = df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }
        (scans.map(_.metrics("numOutputRows").value).sum,
          df.queryExecution.executedPlan.toString)
      }
      val (without, _) = scannedRows(pushdown = false)
      val (withPd, plan) = scannedRows(pushdown = true)
      assert(plan.contains("PushedFilters") && plan.contains("EqualTo(conv_id"),
        s"point predicate not pushed:\n${plan.take(600)}")
      assert(withPd > 0, "scan produced nothing")
      assert(withPd * 3 <= without,
        s"row groups not skipped: scanned $withPd of $without physical rows")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
      spark.conf.set("spark.sql.parquet.filterPushdown", true)
      oldBlock match {
        case Some(v) => hconf.set("parquet.block.size", v)
        case None => hconf.unset("parquet.block.size")
      }
    }
  }

  test("bulk merge write shuffles exactly twice — the merged table is never re-shuffled") {
    // The full-outer bulk path pre-partitions BOTH sides on the
    // functionally-dependent (__bkt, __slt) join keys, so the merge
    // join is subset-co-partitioned and its output flows to the
    // partitionBy writer with NO third exchange. Three exchanges here
    // means the old shape is back: the entire merged table crossing
    // the network a second time per bulk apply — at 100 TB, a full
    // extra copy of the table per load.
    val table = new LakeTable(tmpDir("planbulk"), numBuckets = 8)
    val ev = Corpus.changeEvents(spark, 6000, nConvs = 60, maxTurns = 8)
    // first bulk load seeds the table; the SECOND bulk apply is the
    // interesting plan (non-empty target side)
    CdcApply.applyBatch(spark, table, ev.where(col("_txid") <= 3000),
      pruneBuckets = false)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.QueryExecution]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.add(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val s = CdcApply.applyBatch(spark, table, ev.where(col("_txid") > 3000),
        pruneBuckets = false)
      assert(s.applied > 0)
      import scala.jdk.CollectionConverters._
      def writePlans = plans.iterator().asScala.toSeq.filter { qe =>
        val p = qe.executedPlan.toString
        p.contains("WriteFiles") || p.contains("InsertIntoHadoopFsRelation")
      }
      var tries = 0
      while (writePlans.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      assert(writePlans.nonEmpty, "no write-job plan captured")
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      writePlans.foreach { qe =>
        val nodes = flattenPlan(qe.executedPlan).distinct
        val exchanges = nodes.collect { case e: ShuffleExchangeExec => e }
        assert(exchanges.size == 2,
          s"bulk merge write has ${exchanges.size} exchanges (want 2 — " +
            s"events + target, none above the join):\n${qe.executedPlan}")
        // and the join must sit ABOVE both exchanges (merged output
        // unshuffled): no exchange may contain a sort-merge join
        val shuffledJoin = exchanges.exists(
          e => flattenPlan(e).exists(_.nodeName.contains("SortMergeJoin")))
        assert(!shuffledJoin,
          s"merged join output re-shuffled:\n${qe.executedPlan}")
      }
      // files-per-bucket stays bounded by the salt width
      val dataDir = java.nio.file.Paths.get(table.location, "data")
      val bucketDirs = java.nio.file.Files.list(dataDir).iterator().asScala
        .filter(_.getFileName.toString.startsWith("c")).flatMap { c =>
          java.nio.file.Files.list(c).iterator().asScala
            .filter(_.getFileName.toString.startsWith("_bucket="))
        }.toSeq
      bucketDirs.foreach { b =>
        val nFiles = java.nio.file.Files.list(b).iterator().asScala
          .count(_.getFileName.toString.endsWith(".parquet"))
        assert(nFiles <= CdcApply.SaltBuckets,
          s"bucket dir $b has $nFiles files (> salt width ${CdcApply.SaltBuckets})")
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("text-analysis queries contain no UDFs (pure codegen expressions)") {
    Seq("q22_text_stats", "q23_quality_score", "q25_fingerprint").foreach { n =>
      val p = planOf(n)
      assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"),
        s"$n uses a UDF:\n$p")
    }
  }

  test("round-5 operators stay UDF-free: image codec, reorg precedence, footer ib") {
    // q36 = synth + header decode (native expressions), q57 = the
    // precedence flatten (json_object_keys/get_json_object projection),
    // q58's Spark side is a driver-side footer read over its own write
    Seq("q36_multimodal_decode", "q57_reorg_precedence").foreach { n =>
      val p = planOf(n)
      assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"),
        s"$n uses a UDF:\n$p")
    }
    // the decode expression itself lives inside a WholeStageCodegen span
    val p36 = planOf("q36_multimodal_decode")
    assert(p36.contains("graft_image_meta") || p36.contains("ImageMeta") ||
      p36.toLowerCase.contains("image_meta"),
      s"q36 plan lost the native decode expression:\n$p36")
  }
}
