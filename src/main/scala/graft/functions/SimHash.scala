package graft.functions

import org.apache.spark.sql.{graftshim, Column}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a whitespace-tokenized string as a native Catalyst
  * expression.
  *
  * Semantics: each token's xxhash64 votes ±1 per bit; bits with a
  * positive vote total are set (standard Charikar SimHash). Equivalent
  * to the higher-order-function formulation previously used in
  * `graft.ml.Similarity`, but those run interpreted (HOF lambdas are
  * CodegenFallback) at ~400ns per token-bit; this expression is a tight
  * byte-level loop with codegen — it tokenizes the UTF-8 bytes in place
  * (0x20 never occurs inside a multi-byte UTF-8 sequence, so splitting
  * on the space byte is safe) and never allocates per token.
  *
  * Reference anchor: content-hash dedup family (md5 row hash,
  * /root/reference/lib/moraydump_reorg.js:549-551) extended to the
  * near-dup operators the training-data mandate adds.
  *
  * COMPATIBILITY: this expression skips empty tokens, while the HOF
  * implementation it replaced (split-then-hash) hashed the empty
  * strings produced by consecutive/leading whitespace — so simhash64
  * values differ from pre-replacement ones for any text with repeated
  * spaces. The skip-empties behavior is the correct one (an edit that
  * only changes run-length of whitespace should not flip fingerprint
  * bits); treat stored fingerprints from the old formulation as a
  * different dataset version rather than mixing the two.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  protected override def nullSafeEval(input: Any): Any =
    SimHash64Expr.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** 60-bit SimHash whose per-token hash is the top 60 bits of the MD5
  * digest (= the first 15 hex digits of `md5(token)` parsed as an
  * integer) — bit-for-bit reproducible by ANY engine with md5, which is
  * what makes the exhaustive near-dup query (q50) exactly checkable by
  * the DuckDB oracle in plain SQL. Same tokenize-in-place / skip-empty
  * semantics as [[SimHash64Expr]]; 60 bits because 15 hex digits are
  * the longest md5 prefix that fits a signed 64-bit integer in both
  * engines. MessageDigest is thread-local (one per executor thread). */
case class Md5SimHash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_simhash60"

  protected override def nullSafeEval(input: Any): Any =
    Md5SimHash60Expr.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5SimHash60Expr.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5SimHash60Expr =
    copy(child = newChild)
}

object Md5SimHash60Expr {
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code. */
  def simhash(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val votes = new Array[Int](60)
    val md = mdLocal.get()
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20.toByte) {
        if (i > start) {
          md.reset()
          md.update(bytes, start, i - start)
          val d = md.digest()
          // top 60 bits of the digest = first 15 hex chars as an int
          var h = 0L
          var k = 0
          while (k < 8) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
          h = h >>> 4
          var b = 0
          while (b < 60) {
            votes(b) += ((((h >>> b) & 1L) << 1) - 1L).toInt
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column wrapper. */
  def md5SimHash60(text: Column): Column =
    graftshim.toColumn(Md5SimHash60Expr(graftshim.toExpression(text)))
}

object SimHash64Expr {
  private final val Seed = 42L

  /** Static entry point shared by interpreted eval and generated code. */
  def simhash(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= n) {
      val atSpace = i < n &&
        org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20.toByte
      if (i == n || atSpace) {
        if (i > start) {
          val h = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed)
          var b = 0
          while (b < 64) {
            votes(b) += ((((h >>> b) & 1L) << 1) - 1L).toInt
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column wrapper. */
  def simhash64(text: Column): Column =
    graftshim.toColumn(SimHash64Expr(graftshim.toExpression(text)))
}
