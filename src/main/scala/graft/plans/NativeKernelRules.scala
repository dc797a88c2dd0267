package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.DotDoubleExpr

/** Injected optimizer rule (SURVEY.md §4 custom-rule slot): rewrites the
  * engine-portable dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v) }}}
  *
  * into the native codegen'd [[DotDoubleExpr]] kernel. Users (and the
  * library's own [[graft.operators.VectorOps.dotApprox]]) write portable
  * SQL; plans silently get the tight-loop kernel. Result-identical, not
  * approximate: same left-to-right accumulation order and the same NULL
  * semantics (length mismatch / null element → NULL — see
  * `Native.dotDoubleChecked`), so the rewrite is safe anywhere the
  * pattern appears. Registered via
  * `GraftExtensions.injectOptimizerRule`.
  */
case class NativeKernelRules(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  private def isZeroDouble(e: Expression): Boolean =
    e.dataType == DoubleType && e.foldable && e.eval() == 0.0

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** lambda (p1, p2) -> p1 * p2 (either operand order). */
  private def isPairProduct(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(p1.exprId, p2.exprId)
    case _ => false
  }

  /** lambda (acc, v) -> acc + v (either operand order). */
  private def isPairSum(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(p1.exprId, p2.exprId)
    case _ => false
  }

  /** lambda x -> x (ArrayAggregate's finish). */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(p: NamedLambdaVariable), _) =>
      v.exprId == p.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, mul), zero, merge, finish)
          if isDoubleArray(a) && isDoubleArray(b) &&
            isZeroDouble(zero) && isPairProduct(mul) &&
            isPairSum(merge) && isIdentity(finish) =>
        DotDoubleExpr(a, b)
    }
}
