package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{graftshim, Column}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Recursive JSONB containment `haystack @> needle` as a native
  * Catalyst expression — PostgreSQL jsonb containment semantics, the
  * reference's signature query operator
  * (/root/reference/jsonbQdemo/jsonbquery.md:270-306, 350-387, 477-512):
  *
  *  - object ⊇ object: every needle key exists with a contained value;
  *  - array ⊇ array: every needle element is matched by some haystack
  *    element of the same structural kind (object/array recurse,
  *    primitives compare by strict token equality — 7 ≠ 7.0 ≠ "7");
  *  - top-level special case: an array may contain a bare primitive;
  *  - primitives: strict equality (null only contains null).
  *
  * Matches DuckDB's `json_contains` on all object-shaped and
  * array-in-object predicates (verified in JsonContainsSpec), which is
  * what the driver oracle runs. Codegen calls the same static method
  * the interpreted path uses, so the filter stays inside
  * whole-stage-codegen spans.
  */
case class JsonContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType}, ${right.dataType})")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_json_contains"

  protected override def nullSafeEval(doc: Any, needle: Any): Any =
    JsonContainsExpr.contains(
      doc.asInstanceOf[UTF8String].toString,
      needle.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, n) =>
      s"graft.functions.JsonContainsExpr.contains($d.toString(), $n.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonContainsExpr =
    copy(left = newLeft, right = newRight)
}

object JsonContainsExpr {
  private val mapper = new ObjectMapper()

  /** Static entry point shared by interpreted eval and generated code.
    * Unparseable input → false (PERMISSIVE, like the reference's
    * re-parse-if-parseable helper, lib/moraydump_reorg.js:620-627). */
  def contains(doc: String, needle: String): Boolean =
    try rec(mapper.readTree(doc), mapper.readTree(needle), top = true)
    catch { case scala.util.control.NonFatal(_) => false }

  private def rec(h: JsonNode, n: JsonNode, top: Boolean): Boolean = {
    if (h.isObject && n.isObject) {
      val it = n.properties().iterator()
      var ok = true
      while (ok && it.hasNext) {
        val e = it.next()
        val hv = h.get(e.getKey)
        ok = hv != null && rec(hv, e.getValue, top = false)
      }
      ok
    } else if (h.isArray && n.isArray) {
      val it = n.elements()
      var ok = true
      while (ok && it.hasNext) {
        val nv = it.next()
        val hit = h.elements()
        var found = false
        while (!found && hit.hasNext) {
          val hv = hit.next()
          found =
            if (nv.isContainerNode) rec(hv, nv, top = false)
            else !hv.isContainerNode && hv == nv
        }
        ok = found
      }
      ok
    } else if (h.isArray && !n.isContainerNode && top) {
      // PG special case: a TOP-LEVEL array contains a bare primitive
      val hit = h.elements()
      var found = false
      while (!found && hit.hasNext) {
        val hv = hit.next()
        found = !hv.isContainerNode && hv == n
      }
      found
    } else if (!h.isContainerNode && !n.isContainerNode) {
      h == n // strict token equality: 7 ≠ 7.0 ≠ "7"; null == null
    } else false
  }

  /** Column wrapper: `jsonContains(doc, lit("""{"k": 7}"""))`. */
  def jsonContains(doc: Column, needle: Column): Column =
    graftshim.toColumn(JsonContainsExpr(
      graftshim.toExpression(doc), graftshim.toExpression(needle)))
}
