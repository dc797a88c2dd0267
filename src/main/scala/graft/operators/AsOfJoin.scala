package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the most recent
  * right-side value with `rightTime <= leftTime` for the same key.
  *
  * Implemented with the scalable union + window pattern rather than a
  * per-row correlated lookup: both sides shuffle ONCE on the key, a
  * single sort per partition computes every match (`last(..., ignoreNulls)`
  * over an unbounded-preceding frame). No broadcast of the right side,
  * no O(left × right) blowup — survives arbitrarily large inputs as long
  * as single keys fit a partition (salt keys upstream if one key is
  * pathologically hot).
  */
object AsOfJoin {

  /** @param left      rows to enrich (all columns preserved)
    * @param leftKey   join key column on left
    * @param leftTime  event-time column on left
    * @param right     reference rows
    * @param rightKey  join key column on right
    * @param rightTime effective-from time column on right
    * @param rightVal  value to carry from right
    * @param valName   output column name for the carried value
    */
  def lastValueAsOf(left: DataFrame, leftKey: Column, leftTime: Column,
                    right: DataFrame, rightKey: Column, rightTime: Column,
                    rightVal: Column, valName: String): DataFrame = {
    val refPart = right.select(
      rightKey.cast("long").as("__k"),
      rightTime.cast("timestamp").as("__t"),
      rightVal.as(valName),
      lit(0).as("__side"))
    val evPart = left
      .withColumn("__k", leftKey.cast("long"))
      .withColumn("__t", leftTime.cast("timestamp"))
      .withColumn("__side", lit(1))
    val unioned = evPart.unionByName(refPart, allowMissingColumns = true)
    // Right rows sort before left rows at the same instant (__side 0 < 1)
    // so `rightTime <= leftTime` is inclusive. The carried value is the
    // final sort key: when several right rows share (key, time) the match
    // is deterministically the MAX value, not an arbitrary one.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col(valName).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(valName, last(col(valName), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__k", "__t", "__side")
  }
}
