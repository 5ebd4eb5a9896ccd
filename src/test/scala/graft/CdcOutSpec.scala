package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cdc.{CdcApply, CdcOut}
import graft.model.Corpus
import graft.table.LakeTable

/** CdcOut — the downstream incremental consumer (reference
  * pull_update.sh analogue): exactly-once pulls, crash-idempotent
  * retry, and survival of commit-log rollups via the consumer-held
  * endpoint commit.
  */
class CdcOutSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String, Int, String)*): DataFrame =
    rows.map { case (txid, op, conv, turn, text) =>
      (txid, op, s"e$txid", conv, turn,
        if (op == "delete") null else "user",
        if (op == "delete") null else text,
        null: String, java.sql.Timestamp.valueOf("2014-03-12 00:00:00"))
    }.toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")

  /** Fold pull dirs in order into consumer state keyed by (conv, turn). */
  private def fold(state: Map[(String, Int), String],
      pullDir: String): Map[(String, Int), String] =
    spark.read.parquet(pullDir)
      .select("conv_id", "turn_idx", "_change_type", "text").collect()
      .foldLeft(state) { (m, r) =>
        val k = (r.getString(0), r.getInt(1))
        if (r.getString(2) == "delete") m - k
        else m + (k -> r.getString(3))
      }

  private def liveState(t: LakeTable): Map[(String, Int), String] =
    t.read(spark).select("conv_id", "turn_idx", "text").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap

  test("pulls fold to the live table state; empty head and no-op pulls") {
    val t = new LakeTable(tmpDir("out"), numBuckets = 4)
    val consumer = tmpDir("out-consumer")
    // nothing committed yet
    assert(CdcOut.pull(spark, t, consumer).isEmpty)
    var state = Map.empty[(String, Int), String]
    val batches = Seq(
      ev((1L, "insert", "c1", 0, "a"), (2L, "insert", "c2", 0, "b")),
      ev((3L, "update", "c1", 0, "a2"), (4L, "insert", "c3", 0, "c")),
      ev((5L, "delete", "c2", 0, ""), (6L, "insert", "c1", 1, "d")))
    batches.foreach { b =>
      CdcApply.applyBatch(spark, t, b)
      val p = CdcOut.pull(spark, t, consumer).get
      assert(p.rows > 0)
      state = fold(state, p.dir)
    }
    assert(state == liveState(t))
    assert(state == Map(("c1", 0) -> "a2", ("c3", 0) -> "c", ("c1", 1) -> "d"))
    // head unchanged → no-op, watermark stays
    val before = CdcOut.lastPulled(consumer)
    assert(CdcOut.pull(spark, t, consumer).isEmpty)
    assert(CdcOut.lastPulled(consumer) == before)
  }

  test("crash before the watermark advance re-pulls the same range idempotently") {
    val t = new LakeTable(tmpDir("out-crash"), numBuckets = 4)
    val consumer = tmpDir("out-crash-consumer")
    CdcApply.applyBatch(spark, t, ev((1L, "insert", "c1", 0, "a")))
    CdcOut.pull(spark, t, consumer).get
    val wm = Paths.get(consumer, "watermark.json")
    val saved = Files.readString(wm)
    CdcApply.applyBatch(spark, t, ev((2L, "update", "c1", 0, "a2")))
    val p1 = CdcOut.pull(spark, t, consumer).get
    // simulate a crash between the pull write and the watermark flip
    Files.writeString(wm, saved)
    val p2 = CdcOut.pull(spark, t, consumer).get
    assert(p2.dir == p1.dir && p2.fromVersion == p1.fromVersion &&
      p2.toVersion == p1.toVersion && p2.rows == p1.rows)
    // folding the retried pull twice is still correct (same rows, same dir)
    val state = fold(fold(Map(("c1", 0) -> "a"), p1.dir), p2.dir)
    assert(state == liveState(t))
  }

  test("crash with an advanced head: the orphan dir is removed, the chain stays foldable") {
    val t = new LakeTable(tmpDir("out-orphan"), numBuckets = 4)
    val consumer = tmpDir("out-orphan-consumer")
    CdcApply.applyBatch(spark, t, ev((1L, "insert", "c1", 0, "a")))
    CdcOut.pull(spark, t, consumer).get
    val wm = Paths.get(consumer, "watermark.json")
    val saved = Files.readString(wm)
    CdcApply.applyBatch(spark, t, ev((2L, "insert", "c9", 0, "x")))
    val orphan = CdcOut.pull(spark, t, consumer).get // written, then "crash":
    Files.writeString(wm, saved)                     // watermark never flipped
    // the head advances past the crashed range, DELETING the key the
    // orphan inserted — folding the orphan would resurrect it
    CdcApply.applyBatch(spark, t, ev((3L, "delete", "c9", 0, "")))
    // retry: range c1..head nets to nothing (insert+delete cancel) →
    // acknowledged with no directory, and the orphan is gone
    assert(CdcOut.pull(spark, t, consumer).isEmpty)
    assert(CdcOut.lastPulled(consumer) == t.currentCommit().get.version)
    assert(!Files.exists(Paths.get(orphan.dir)), "orphan pull dir survived")
    val dirs = Files.list(Paths.get(consumer)).iterator()
    val pulls = scala.jdk.CollectionConverters.IteratorHasAsScala(dirs).asScala
      .map(_.getFileName.toString).filter(_.startsWith("pull-")).toSeq.sorted
    val state = pulls.foldLeft(Map.empty[(String, Int), String])(
      (m, d) => fold(m, s"$consumer/$d"))
    assert(state == liveState(t))
  }

  test("maintenance-only head advance acknowledges without emitting a pull") {
    val t = new LakeTable(tmpDir("out-maint"), numBuckets = 4)
    val consumer = tmpDir("out-maint-consumer")
    CdcApply.applyBatch(spark, t, ev((1L, "insert", "c1", 0, "a")))
    CdcOut.pull(spark, t, consumer).get
    t.renameColumn("tool", "tool_name")
    val before = CdcOut.lastPulled(consumer)
    assert(CdcOut.pull(spark, t, consumer).isEmpty)
    assert(CdcOut.lastPulled(consumer) > before, "rename version not acknowledged")
    val leftovers = Files.list(Paths.get(consumer)).iterator()
    val empties = scala.jdk.CollectionConverters.IteratorHasAsScala(leftovers).asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith(f"pull-$before%012d-")).toSeq
    assert(empties.isEmpty, s"empty pull dirs left behind: $empties")
  }

  test("a lagging consumer reads pre-promotion files correctly after a log rollup") {
    import spark.implicits._
    def evScore(txid: Long, conv: String, score: org.apache.spark.sql.Column) =
      Seq((txid, "update", s"e$txid", conv, 0))
        .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx")
        .withColumn("score", score)
    val t = new LakeTable(tmpDir("out-promote"), numBuckets = 2)
    val consumer = tmpDir("out-promote-consumer")
    CdcApply.applyBatch(spark, t, evScore(1, "cA", lit(5)))       // score: int
    CdcOut.pull(spark, t, consumer).get                           // holds v1
    CdcApply.applyBatch(spark, t, evScore(2, "cB", lit(2.5)))     // → double
    CdcApply.applyBatch(spark, t, evScore(3, "cA", lit(7.5)))
    // rewrite every dir, then roll the log up: v1's writer schema (the
    // int-score vintage) is pruned — the consumer's endpoint must fall
    // back to the parquet footers, never scan int files as double
    assert(t.compact(spark, tombstoneHorizon = Long.MaxValue).nonEmpty)
    t.checkpointLog()
    val p = CdcOut.pull(spark, t, consumer).get
    val got = spark.read.parquet(p.dir)
      .select("conv_id", "_change_type", "score").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == Map("cA" -> (("update", 7.5)), "cB" -> (("insert", 2.5))))
  }

  test("a lagging consumer survives a commit-log rollup") {
    val t = new LakeTable(tmpDir("out-lag"), numBuckets = 4)
    val consumer = tmpDir("out-lag-consumer")
    CdcApply.applyBatch(spark, t,
      Corpus.changeEvents(spark, 1500, nConvs = 30, maxTurns = 6))
    val p0 = CdcOut.pull(spark, t, consumer).get
    var state = fold(Map.empty, p0.dir)
    // table advances several commits, then the log is rolled up —
    // the consumer's from-endpoint is no longer in the retained log
    CdcApply.applyBatch(spark, t, ev((100001L, "update", "conv00000001", 0, "z1")))
    CdcApply.applyBatch(spark, t, ev((100002L, "delete", "conv00000002", 0, "")))
    t.checkpointLog()
    assert(!t.commitLog().exists(_.version == p0.toVersion),
      "rollup should have dropped the consumer's endpoint from the log")
    val p1 = CdcOut.pull(spark, t, consumer).get
    assert(p1.fromVersion == p0.toVersion)
    state = fold(state, p1.dir)
    assert(state == liveState(t))
    // the incremental pull read only what churned, not the whole table
    assert(p1.rows < 1500 / 10, s"pull read ${p1.rows} rows — not incremental?")
  }
}
