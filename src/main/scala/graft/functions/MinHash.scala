package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{graftshim, Column}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** k-entry MinHash signature of a shingle array as ONE native
  * codegen'd expression — the compiled replacement for the
  * higher-order-function formulation in `graft.ml.Similarity`
  * (`aggregate(transform(shg, xxhash64), array_repeat(MaxValue, k),
  * zip_with(least ∘ xxhash64))`): HOF lambdas are CodegenFallback, so
  * that shape paid ~|shingles|×k interpreted expression-tree walks per
  * row (≈13k at 200 shingles × k=64 — the dominant q30/q32 cost).
  *
  * BIT-IDENTICAL to the HOF form it replaces: the base hash is Spark's
  * `xxhash64(shingle)` (XXH64 over the UTF-8 bytes, seed 42) and the
  * j-th derived hash is Spark's `xxhash64(j, base)` — XXH64.hashLong
  * of the base chained onto XXH64.hashInt(j, 42), exactly the
  * universal-hashing trick the column version evaluated — so stored
  * signatures and the MlSpec estimate properties carry over unchanged.
  *
  * Reference anchor: content-hash dedup family
  * (/root/reference/lib/moraydump_reorg.js:549-551) extended to the
  * near-dup operators the training-data mandate adds.
  */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1 && k <= 4096, "k must be in [1, 4096]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.sig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSigExpr.sig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {

  private final val Seed = 42L

  /** seed_j = xxhash64(j) under Spark's seed — computed once per k. */
  private val seedCache = new ConcurrentHashMap[Int, Array[Long]]()
  private def seedsFor(k: Int): Array[Long] =
    seedCache.computeIfAbsent(k, { _ =>
      Array.tabulate(k)(j => XXH64.hashInt(j, Seed))
    })

  /** Static entry point shared by interpreted eval and generated code. */
  def sig(shingles: ArrayData, k: Int): ArrayData = {
    val seeds = seedsFor(k)
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      // a null element contributes h = Seed, exactly as the HOF form's
      // xxhash64(null) did (Spark hash functions leave the seed
      // untouched on null input) — signatures stored by either form
      // stay bit-identical even for arrays with containsNull = true
      val h =
        if (s == null) Seed
        else XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)
      var j = 0
      while (j < k) {
        val hj = XXH64.hashLong(h, seeds(j))
        if (hj < out(j)) out(j) = hj
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: array<long> MinHash signature. */
  def minhashSig(shingles: Column, k: Int): Column =
    graftshim.toColumn(MinHashSigExpr(graftshim.toExpression(shingles), k))
}
