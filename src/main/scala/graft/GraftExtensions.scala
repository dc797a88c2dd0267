package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{DotDoubleExpr, MinhashSignatureExpr, SimHash32Expr}

/** SparkSessionExtensions entry point: registers the native expressions
  * as SQL functions so they compose with the rest of the declarative
  * plan (and stay inside whole-stage codegen). Wire up with
  * `spark.sql.extensions=graft.GraftExtensions` — [[GraftSession]] does
  * this by default.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles, k) - k-entry MinHash signature (min md5 per seed)"),
      (args: Seq[Expression]) => {
        val k = args.lift(1) match {
          case Some(Literal(v: Int, _)) => v
          case Some(other) => other.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case x => throw new IllegalArgumentException(s"graft_minhash k must be an integer literal, got $x")
          }
          case None => 12
        }
        MinhashSignatureExpr(args.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash32"),
      info("graft_simhash32", "graft_simhash32(features) - 32-bit SimHash of a string array"),
      (args: Seq[Expression]) => SimHash32Expr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - double dot product of two double arrays"),
      (args: Seq[Expression]) => DotDoubleExpr(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_collect_capped"),
      info("graft_collect_capped",
        "graft_collect_capped(v, cap) - sorted distinct longs, or NULL once the group exceeds cap (bounded state)"),
      (args: Seq[Expression]) => {
        val cap = args.lift(1) match {
          case Some(Literal(v: Int, _)) => v
          case Some(other) => other.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case x => throw new IllegalArgumentException(
              s"graft_collect_capped cap must be an integer literal, got $x")
          }
          case None => throw new IllegalArgumentException(
            "graft_collect_capped requires (value, cap)")
        }
        graft.functions.CollectCappedExpr(args.head, cap).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_kmin"),
      info("graft_kmin",
        "graft_kmin(v, k) - the k smallest distinct longs of the group, sorted ascending (bounded state; KMV sketch kernel)"),
      (args: Seq[Expression]) => {
        val k = args.lift(1) match {
          case Some(Literal(v: Int, _)) => v
          case Some(other) => other.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case x => throw new IllegalArgumentException(
              s"graft_kmin k must be an integer literal, got $x")
          }
          case None => throw new IllegalArgumentException(
            "graft_kmin requires (value, k)")
        }
        graft.functions.KMinExpr(args.head, k).toAggregateExpression()
      }))
    // Optimizer rule: portable SQL dot-product folds → native kernel.
    ext.injectOptimizerRule(graft.plans.NativeKernelRules)
    // Planner strategy: native sort-merge as-of join plan node.
    ext.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
  }
}
