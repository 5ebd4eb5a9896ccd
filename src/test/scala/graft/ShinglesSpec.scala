package graft

import org.apache.spark.sql.functions._

import graft.ml.Similarity

/** The native ShinglesExpr must produce exactly the values of the HOF
  * formulation it replaced — element order included (array_distinct
  * keeps first occurrence) — or stored MinHash signatures and the
  * q30/q32 oracle rows would silently drift. */
class ShinglesSpec extends SparkSpec {

  private val adversarial = Seq(
    "",                       // no tokens
    " ",                      // two empty tokens
    "a",                      // fewer tokens than n
    "a b",                    // still fewer
    "a b c",                  // exactly n
    "a  b   c d",             // empty tokens inside (double/triple spaces)
    "a b c d e f g",          // normal
    "x x x x x",              // duplicate shingles collapse
    "tail space ",            // trailing empty token
    " lead space",            // leading empty token
    "ünï çödé tokens here",   // non-ascii
    "a b c a b c a b c")      // repeated phrase → distinct keeps first

  test("native shingles == HOF shingles on adversarial cases (n=3)") {
    import spark.implicits._
    val df = adversarial.toDF("text")
    val got = df.select(
      Similarity.shingles(col("text"), 3).as("nat"),
      Similarity.shinglesHof(col("text"), 3).as("hof"))
    val rows = got.collect()
    rows.zip(adversarial).foreach { case (r, t) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"shingle mismatch for input '$t'")
    }
  }

  test("native shingles == HOF shingles over the corpus documents (n=2..4)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    (2 to 4).foreach { n =>
      val bad = docs.select(
          Similarity.shingles(col("text"), n).as("nat"),
          Similarity.shinglesHof(col("text"), n).as("hof"))
        .where(not(col("nat") <=> col("hof")))
        .count()
      assert(bad == 0L, s"n=$n: $bad corpus rows differ")
    }
  }
}
