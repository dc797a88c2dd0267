package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Native Catalyst expressions for the hot per-row kernels (SURVEY.md §2
  * has no UDF surface — these are beyond-reference performance operators).
  *
  * Each participates in whole-stage codegen via `doGenCode` emitting a
  * call to the [[Native]] kernel — no boxed lambda interpretation, no
  * Scala UDF serialization penalty, null handling inherited from
  * `nullSafeCodeGen`. Registered as SQL functions by
  * [[graft.GraftExtensions]] (`graft_minhash`, `graft_simhash32`,
  * `graft_dot`).
  *
  * (Input type checks are hand-rolled: `ExpectsInputTypes` needs
  * `AbstractDataType`, which is `private[sql]` in Spark 4.)
  */
private object TypeChecks {
  def requireStringArray(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<string>, got ${other.catalogString}")
  }
  def requireDoubleArray(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<double>, got ${other.catalogString}")
  }
}

case class MinhashSignatureExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireStringArray(prettyName, child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    Native.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Native.minhash($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash32Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireStringArray(prettyName, child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    Native.simhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Native.simhash32($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DotDoubleExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = TypeChecks.requireDoubleArray(prettyName, left.dataType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else TypeChecks.requireDoubleArray(prettyName, right.dataType)
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Native.dotDoubleChecked(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""java.lang.Double $tmp = graft.functions.Native.dotDoubleChecked($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
