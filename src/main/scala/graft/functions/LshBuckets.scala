package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{graftshim, Column}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket keys for an embedding vector as ONE
  * native codegen'd expression: input `array<float|double>`, output
  * `array<long>` of length `tables` where element `t` packs the
  * `planes` projection sign bits for hash table `t`.
  *
  * Replaces the higher-order-function formulation in `graft.ml.Vectors`
  * (nested `transform`/`aggregate`/`zip_with` with a per-element
  * `xxhash64(table, plane, i)` sign draw): HOF lambdas are
  * CodegenFallback, so that shape evaluated ~tables×planes×dim
  * interpreted hash calls PER ROW (9,216 at the 12×12×64 defaults —
  * measured 2.7s for 4k rows, the whole q43 budget). Here the ±1 plane
  * components are materialized ONCE per (planes, tables, dim) into a
  * flat sign table cached on each executor, and the per-row work is a
  * tight primitive multiply-add loop compiled into the stage.
  *
  * Sign rule: component (t, p, i) is +1 iff the first hex digit of
  * md5("t:p:i") is even — the SAME rule the quantized mode exposed
  * through `Vectors.lshBucketsPortable` uses, so the production path
  * and the engine-portable parity oracle (q51) draw planes from one
  * family.
  * Sign-random projections only need sign agreement between rows, not
  * Gaussian components, so any fixed deterministic draw is a valid LSH
  * family (Charikar hyperplane hashing).
  *
  * Reference anchor: the near-dup/ANN operator family the training-data
  * mandate adds on top of moray-etl-jsonb's content-hash dedup
  * (/root/reference/lib/moraydump_reorg.js:549-551).
  */
case class LshBucketsExpr(child: Expression, planes: Int, tables: Int,
    quantized: Boolean = false)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 63, "planes must be in [1, 63]")
  require(tables >= 1, "tables must be >= 1")

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${child.dataType}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  private def isFloat: Boolean = elemType == FloatType

  protected override def nullSafeEval(input: Any): Any =
    LshBucketsExpr.buckets(input.asInstanceOf[ArrayData], planes, tables,
      isFloat, quantized)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBucketsExpr.buckets($c, $planes, $tables, $isFloat, $quantized)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

object LshBucketsExpr {

  /** Per-executor cache of flat ±1 sign tables, keyed by
    * (planes, tables, dim); entry (t, p, i) lives at
    * ((t * planes) + p) * dim + i. A 12×12×1024 table is 1.1 MB —
    * embeddings have few distinct dims, so the cache stays tiny. */
  private val signCache =
    new ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def signs(planes: Int, tables: Int, dim: Int): Array[Double] =
    signCache.computeIfAbsent((planes, tables, dim), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Double](tables * planes * dim)
      var t = 0
      while (t < tables) {
        var p = 0
        while (p < planes) {
          var i = 0
          while (i < dim) {
            md.reset()
            val d = md.digest(s"$t:$p:$i".getBytes("UTF-8"))
            out(((t * planes) + p) * dim + i) =
              if ((((d(0) >> 4) & 0xF) % 2) == 0) 1.0 else -1.0
            i += 1
          }
          p += 1
        }
        t += 1
      }
      out
    })

  /** Half-away-from-zero rounding, matching Spark's round() (decimal
    * HALF_UP) and DuckDB's round() on doubles — Java's Math.round alone
    * rounds negative halves toward +inf. */
  private def rnd(x: Double): Long =
    if (x >= 0) Math.round(x) else -Math.round(-x)

  /** Static entry point shared by interpreted eval and generated code.
    * `quantized` projects over round(x*1000) longs with INTEGER
    * accumulation — sign decisions are exactly order-independent, so an
    * external SQL oracle recomputing the projection in any summation
    * order gets bit-identical buckets (q34/q51); the double path is the
    * engine fast path (q43 near-dup defaults). */
  def buckets(vec: ArrayData, planes: Int, tables: Int, isFloat: Boolean,
      quantized: Boolean): ArrayData = {
    val dim = vec.numElements()
    val s = signs(planes, tables, dim)
    val out = new Array[Long](tables)
    if (quantized) {
      val zv = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        zv(i) = rnd(x * 1000)
        i += 1
      }
      var t = 0
      while (t < tables) {
        var key = 0L
        var p = 0
        while (p < planes) {
          val base = ((t * planes) + p) * dim
          var proj = 0L
          var j = 0
          while (j < dim) {
            proj += (if (s(base + j) > 0) zv(j) else -zv(j)); j += 1
          }
          if (proj >= 0) key |= (1L << p)
          p += 1
        }
        out(t) = key
        t += 1
      }
    } else {
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        i += 1
      }
      var t = 0
      while (t < tables) {
        var key = 0L
        var p = 0
        while (p < planes) {
          val base = ((t * planes) + p) * dim
          var proj = 0.0
          var j = 0
          while (j < dim) { proj += v(j) * s(base + j); j += 1 }
          if (proj >= 0) key |= (1L << p)
          p += 1
        }
        out(t) = key
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: array<long> of per-table bucket keys. */
  def lshBucketKeys(vec: Column, planes: Int, tables: Int,
      quantized: Boolean = false): Column =
    graftshim.toColumn(
      LshBucketsExpr(graftshim.toExpression(vec), planes, tables, quantized))
}
