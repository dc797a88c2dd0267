package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.plans.AsOfJoinPlan

/** DataFrame-facing wrapper for the native as-of join plan node
  * ([[graft.plans.AsOfJoinPlan]]): normalizes key/time to LONG columns,
  * hands resolved child plans + attribute references to the logical
  * node, and strips the helper columns from the result. Requires the
  * two inputs to be distinct plans (a self-join needs an alias on one
  * side — same restriction the composed operator avoids by unioning).
  */
object AsOfJoinNativeApi {

  def lastValueAsOf(left: DataFrame, leftKey: Column, leftTime: Column,
                    right: DataFrame, rightKey: Column, rightTime: Column,
                    rightVal: Column, valName: String): DataFrame = {
    val l2 = left
      .withColumn("__asof_k", leftKey.cast("long"))
      .withColumn("__asof_t", unix_micros(leftTime.cast("timestamp")))
    val r2 = right.select(
      rightKey.cast("long").as("__asof_k"),
      unix_micros(rightTime.cast("timestamp")).as("__asof_t"),
      rightVal.as("__asof_v"))
    val lPlan = Bridge.analyzed(l2)
    val rPlan = Bridge.analyzed(r2)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalStateException(s"missing $name in ${plan.output}"))
    val rValAttr = attr(rPlan, "__asof_v")
    val valAttr = AttributeReference(valName, rValAttr.dataType, nullable = true)()
    Bridge.ofRows(left.sparkSession, AsOfJoinPlan(
        lPlan, rPlan,
        attr(lPlan, "__asof_k"), attr(lPlan, "__asof_t"),
        attr(rPlan, "__asof_k"), attr(rPlan, "__asof_t"),
        rValAttr, valAttr))
      .drop("__asof_k", "__asof_t")
  }
}
