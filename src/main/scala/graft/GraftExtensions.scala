package graft

import graft.functions.PercentDecode
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension injector — the idiomatic library integration point:
  *
  *   spark.sql.extensions=graft.GraftExtensions          (config), or
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *
  * registers the library's native Catalyst functions in every session
  * built from that builder, instead of mutating one session's
  * functionRegistry after the fact (PercentDecode.register remains for
  * ad-hoc use). The injected expression has real `doGenCode`, so SQL
  * callers stay inside whole-stage codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator tier: the interval first-match join as a custom
    // LogicalPlan + SparkStrategy + SparkPlan (graft.plans); sessions
    // without the extension fall back to the typed-cogroup path
    // (IntervalJoin.firstMatchAuto)
    ext.injectPlannerStrategy(_ => new graft.plans.IntervalFirstMatchStrategy)
    ext.injectFunction((
      FunctionIdentifier("percent_decode"),
      new ExpressionInfo(classOf[PercentDecode].getCanonicalName,
        "percent_decode"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"percent_decode expects exactly 1 argument, got ${exprs.length}")
        PercentDecode(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinhashSig].getCanonicalName,
        "minhash_sig"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"minhash_sig expects (shingles, k), got ${exprs.length} args")
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig k must be an integer literal, got $other")
        }
        graft.functions.MinhashSig(exprs.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("topk_sorted"),
      new ExpressionInfo(classOf[graft.functions.TopKSorted].getCanonicalName,
        "topk_sorted"),
      (exprs: Seq[Expression]) => {
        // aggregate: the analyzer wraps a returned AggregateFunction in
        // its AggregateExpression during function resolution
        if (exprs.length != 3)
          throw new IllegalArgumentException(
            s"topk_sorted expects (value, k, distinct), got ${exprs.length} args")
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"topk_sorted k must be an integer literal, got $other")
        }
        val dist = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"topk_sorted distinct must be a boolean literal, got $other")
        }
        graft.functions.TopKSorted(exprs.head, k, dist)
      }))
  }
}
