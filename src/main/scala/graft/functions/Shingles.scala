package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{graftshim, Column}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column as ONE native
  * codegen'd expression — the compiled replacement for the
  * higher-order-function formulation in `graft.ml.Similarity.shingles`
  * (`array_distinct(filter(transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i+1, n))), s => length(s) > 0))`): HOF lambdas are
  * CodegenFallback, so that shape paid ~|tokens| interpreted
  * expression-tree walks per row, each allocating a slice copy — the
  * single largest job of q30/q32's bench wall (≈1.9 s across 32 cores
  * at sf0.1) before this expression.
  *
  * VALUE-IDENTICAL to the HOF form it replaces, edge cases included:
  *  - tokens = text.split(" ", -1) (trailing empties kept, exactly
  *    Spark's `split(text, " ")`);
  *  - one shingle per i in [0, max(#toks − n, 0)] — so a text with
  *    fewer than n tokens yields its full token join (slice truncates);
  *  - empty-string shingles dropped (all-empty-token runs);
  *  - distinct keeps first-occurrence order (array_distinct semantics).
  * ShinglesSpec asserts equality against the HOF form per row over the
  * bench corpus and adversarial whitespace cases.
  */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 64, "n must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  protected override def nullSafeEval(input: Any): Any =
    ShinglesExpr.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShinglesExpr.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {

  /** Static entry point shared by interpreted eval and generated code. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    // identical token split to Spark's split(text, " "): regex " " with
    // limit -1 (trailing empty tokens kept)
    val toks = text.toString.split(" ", -1)
    val last = math.max(toks.length - n, 0)
    val seen = new mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= last) {
      sb.setLength(0)
      val end = math.min(i + n, toks.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      if (sb.length > 0) seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    var k = 0
    seen.foreach { s => out(k) = UTF8String.fromString(s); k += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper: array<string> of distinct word n-gram shingles. */
  def shingles(text: Column, n: Int): Column =
    graftshim.toColumn(ShinglesExpr(graftshim.toExpression(text), n))
}
