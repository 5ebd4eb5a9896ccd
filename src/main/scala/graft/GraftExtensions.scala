package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{ImageMetaExpr, JsonContainsExpr, Md5SimHash60Expr, MinHashSigExpr, SimHash64Expr, SynthImageExpr}
import graft.table.LakeTable

/** SQL surface for the engine, injected via the standard
  * `spark.sql.extensions` mechanism (or `builder.withExtensions`):
  *
  *   - the native Catalyst expressions become SQL functions —
  *     `graft_simhash64(text)`, `graft_md5_simhash60(text)`,
  *     `graft_jsonb_contains(doc, needle)` (the reference's `@>`
  *     operator, /root/reference/docs/writeup.md JSONB query surface),
  *     `graft_minhash_sig(shingles, k)` and `graft_image_meta(blob)` —
  *     so `spark.sql` users get the same codegen'd hot path as the
  *     DataFrame API;
  *   - `SELECT ... FROM graft.`+"`/path/to/table`"+` resolves to the
  *     latest snapshot of the [[LakeTable]] at that path (tombstones
  *     filtered, merge-on-read deltas resolved). The injected plan is
  *     the same pruned parquet union the programmatic reader builds, so
  *     Catalyst pushes filters/projections into the scans as usual.
  *     A `@v<N>` suffix pins a past snapshot (VERSION AS OF, the
  *     Delta `table@v123` idiom): `graft.`+"`/path@v3`"+` reads
  *     version 3 via [[LakeTable.readVersion]], with the same
  *     retention-window refusals as the programmatic API. The suffix
  *     is reserved — a literal directory name ending in `@v<digits>`
  *     cannot be addressed through the facade.
  *
  * Session state is never mutated outside the supported injection
  * points; the rule only rewrites relations whose first name part is
  * the `graft` namespace, so normal catalog resolution is untouched.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn1(name: String, clazz: String, build: Expression => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz, name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
        build(args.head)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn1("graft_simhash64",
      classOf[SimHash64Expr].getName, SimHash64Expr(_)))
    ext.injectFunction(fn1("graft_md5_simhash60",
      classOf[Md5SimHash60Expr].getName, Md5SimHash60Expr(_)))
    ext.injectFunction((
      FunctionIdentifier("graft_jsonb_contains"),
      new ExpressionInfo(classOf[JsonContainsExpr].getName, "graft_jsonb_contains"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_jsonb_contains expects 2 arguments, got ${args.length}")
        JsonContainsExpr(args.head, args(1))
      }))
    ext.injectFunction(fn1("graft_image_meta",
      classOf[ImageMetaExpr].getName, ImageMetaExpr(_)))
    ext.injectFunction((
      FunctionIdentifier("graft_synth_image"),
      new ExpressionInfo(classOf[SynthImageExpr].getName, "graft_synth_image"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"graft_synth_image expects 3 arguments, got ${args.length}")
        SynthImageExpr(args(0), args(1), args(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_minhash_sig expects 2 arguments, got ${args.length}")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_sig: k must be an integer literal, got $other")
        }
        MinHashSigExpr(args.head, k)
      }))
    ext.injectResolutionRule(GraftTableResolution)
  }
}

/** Resolves `graft`.`<table-path>` relations to the lake table's latest
  * snapshot. Runs inside the analyzer's main resolution batch, after
  * catalog lookup has left the unknown `graft` namespace unresolved. */
case class GraftTableResolution(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") =>
        val ident = u.multipartIdentifier(1)
        val at = ident.lastIndexOf("@v")
        // toLongOption, not forall(isDigit): a >19-digit numeric tail
        // must fall back to the literal-path interpretation, not throw
        // NumberFormatException out of the analyzer
        val version =
          if (at > 0) ident.substring(at + 2).toLongOption.filter(_ >= 0)
          else None
        val path = if (version.isDefined) ident.substring(0, at) else ident
        val t = new LakeTable(path)
        version.map(t.readVersion(spark, _)).getOrElse(t.read(spark))
          .queryExecution.analyzed
    }
}
