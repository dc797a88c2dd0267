package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, JoinedRow, NullsFirst, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the full custom-operator ladder (SURVEY.md §7.3's
  * "optional" rung, guide §"Custom operator"): logical node → planner
  * strategy → physical sort-merge exec, registered through
  * [[graft.GraftExtensions]].
  *
  * Semantics match [[graft.operators.AsOfJoin.lastValueAsOf]]
  * (spec-asserted on non-null keys): for each left row, the right value
  * with the greatest `rightTime <= leftTime` for the same key; ties on
  * (key, time) take the maximum value; no-match rows get NULL; NULL
  * times behave as -infinity on both sides (as in the composed
  * operator's NullsFirst window). One deliberate divergence: NULL keys
  * never match here (SQL equality semantics, like the oracle's
  * correlated subquery), whereas the composed window groups null keys
  * together.
  *
  * Physical shape: both sides hash-cluster on the key (Catalyst inserts
  * the exchanges + sorts from the declared requirements) and one
  * streaming merge pass per partition carries the running last value —
  * no union of mismatched schemas, no window state, O(n+m) per
  * partition. Keys and times are normalized to LONG by the API wrapper
  * so the merge compares primitives.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    rightVal: Expression, valAttr: AttributeReference)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ valAttr
  // valAttr is minted by this node, not pulled from a child.
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(valAttr :: Nil)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, rv, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, rv, out) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    rightVal: Expression, valAttr: AttributeReference)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ valAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(valAttr :: Nil)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  private def asc(e: Expression) = SortOrder(e, Ascending, NullsFirst, Seq.empty)

  // Right additionally sorts by value so equal (key, time) rows resolve
  // deterministically to the max value (the composed operator's
  // contract).
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(asc(leftKey), asc(leftTime)) :: Seq(asc(rightKey), asc(rightTime), asc(rightVal)) :: Nil

  override def outputOrdering: Seq[SortOrder] = Seq(asc(leftKey), asc(leftTime))

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey; val lt = leftTime
    val rk = rightKey; val rt = rightTime; val rv = rightVal
    val valAttrLocal = valAttr
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk, rt), rOut)
      val rValProj = UnsafeProjection.create(Seq(rv), rOut)
      val outProj = UnsafeProjection.create(output, lOut :+ valAttrLocal)
      val joined = new JoinedRow
      val nullVal = InternalRow(null)
      // Reused single-field row for the carried value: the row cache is
      // overwritten before each emit, and outProj copies the data into the
      // output UnsafeRow, so no allocation per left row.
      val valRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val valType = valAttrLocal.dataType

      // rHead ordering keys live in a reused buffer: the right iterator
      // (a sort output) reuses its UnsafeRow, but rKeyProj's target buffer
      // is stable between calls, so the projected keys stay valid until
      // the next projection — no per-row copy needed for the keys. Only
      // the CARRIED value must survive arbitrarily many right rows, so
      // only that one is copied, and only when it becomes the candidate.
      var rHead: InternalRow = null
      var rHeadKeys: UnsafeRow = null
      var lastVal: UnsafeRow = null
      var lastValKey: Long = 0L
      var lastValSet = false

      // NULL times sort NullsFirst and behave as -infinity — identical
      // to the composed union+window operator, where a null-time right
      // row orders before everything and its value is inherited.
      def timeOf(keys: UnsafeRow): Long =
        if (keys.isNullAt(1)) Long.MinValue else keys.getLong(1)

      lIt.map { lRow =>
        val lKeys = lKeyProj(lRow)
        if (lKeys.isNullAt(0)) {
          // NULL left key: never matches.
          outProj(joined(lRow, nullVal))
        } else {
          val lKey = lKeys.getLong(0)
          val lTime = timeOf(lKeys)
          var advancing = true
          while (advancing && (rHead != null || rIt.hasNext)) {
            if (rHead == null) {
              rHead = rIt.next()
              rHeadKeys = rKeyProj(rHead)
            }
            if (rHeadKeys.isNullAt(0)) {
              rHead = null // skip NULL right keys
            } else {
              val rKey = rHeadKeys.getLong(0)
              val rTime = timeOf(rHeadKeys)
              if (rKey < lKey || (rKey == lKey && rTime <= lTime)) {
                lastVal = rValProj(rHead).copy()
                lastValKey = rKey
                lastValSet = true
                rHead = null
              } else advancing = false
            }
          }
          if (lastValSet && lastValKey == lKey) {
            valRow.update(0,
              if (lastVal.isNullAt(0)) null else lastVal.get(0, valType))
            outProj(joined(lRow, valRow))
          } else {
            outProj(joined(lRow, nullVal))
          }
        }
      }
    }
  }
}
