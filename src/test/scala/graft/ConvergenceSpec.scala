package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.cdc.CdcApply
import graft.table.LakeTable

/** Property-based check of the engine's core claim: the final table
  * state is a PURE FUNCTION of the event set — independent of how the
  * events are partitioned into batches, the order batches are applied,
  * and duplication across batches. ScalaCheck generates the cases;
  * seeds are fixed so failures reproduce. The in-test oracle applies
  * the semantics directly (per key: highest (_txid, _etag) wins;
  * winner op=delete → key absent). */
class ConvergenceSpec extends SparkSpec {

  private case class Ev(txid: Long, op: String, conv: String, turn: Int, text: String)

  private val genCase: Gen[(List[Ev], Int, List[Int])] = for {
    n <- Gen.choose(20, 120)
    txids <- Gen.pick(n, 1L to 400L)
    evs <- Gen.sequence[List[Ev], Ev](txids.toList.map { t =>
      for {
        conv <- Gen.choose(0, 4).map(i => f"conv$i%04d")
        turn <- Gen.choose(0, 3)
        del <- Gen.prob(0.25)
      } yield Ev(t, if (del) "delete" else "update", conv, turn, s"v$t")
    })
    nBatches <- Gen.choose(1, 4)
    // a permutation of batch indices — batches applied out of order
    order <- Gen.const((0 until nBatches).toList).flatMap(l =>
      Gen.choose(0, 1000).map(s => new scala.util.Random(s).shuffle(l)))
  } yield (evs, nBatches, order)

  private def oracle(evs: Seq[Ev]): Map[(String, Int), String] =
    evs.groupBy(e => (e.conv, e.turn))
      .view.mapValues(_.maxBy(e => (e.txid, s"e${e.txid}")))
      .collect { case (k, w) if w.op != "delete" => k -> w.text }
      .toMap

  private def toDf(evs: Seq[Ev]) = {
    import spark.implicits._
    evs.map(e => (e.txid, e.op, s"e${e.txid}", e.conv, e.turn,
        if (e.op == "delete") null else "user",
        if (e.op == "delete") null else e.text,
        null: String,
        if (e.op == "delete") null: java.sql.Timestamp
        else java.sql.Timestamp.valueOf("2014-03-11 00:00:01")))
      .toDF("_txid", "_op", "_etag", "conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  test("final state is a pure function of the event set (random batching + order + dups)") {
    (0 until 8).foreach { i =>
      val (evs, nBatches, order) =
        genCase.apply(Gen.Parameters.default, Seed(42L + i))
          .getOrElse(fail(s"generator produced no case for seed $i"))
      val table = new LakeTable(tmpDir(s"prop$i"), numBuckets = 4)
      // deal events round-robin into batches, then apply in the random
      // order; one batch is also applied TWICE (duplication)
      val batches = (0 until nBatches).map(b =>
        evs.zipWithIndex.collect { case (e, j) if j % nBatches == b => e })
      order.foreach(b => CdcApply.applyBatch(spark, table, toDf(batches(b)),
        maxDeltaDepth = 1 + i % 3))
      CdcApply.applyBatch(spark, table, toDf(batches(order.head)))
      val got = table.read(spark)
        .select("conv_id", "turn_idx", "text").collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
      val want = oracle(evs)
      assert(got == want,
        s"seed ${42L + i}: nBatches=$nBatches order=$order\n got=$got\nwant=$want")
    }
  }
}
