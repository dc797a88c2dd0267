package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — the canonical "operator Spark lacks" (alongside
  * as-of join): `left ⋈ right ON key equal AND rightTime − leftTime ∈
  * [lo, hi]`. A naive theta-join degenerates to per-key cross products;
  * this implementation bucketizes time by the band width so each left
  * row equi-joins AT MOST TWO buckets, then filters the exact band:
  * shuffle volume is O(|left| + |right|) rows on (key, bucket) and the
  * worst-case fan-out is 2×, independent of data size — the shape that
  * survives 100 TB. (Composing built-ins per the custom-operator
  * preference order; no custom physical operator needed.)
  *
  * Times are compared in microseconds. Bounds are inclusive.
  */
object RangeJoin {

  def bandJoin(left: DataFrame, leftKey: Column, leftTime: Column,
               right: DataFrame, rightKey: Column, rightTime: Column,
               loUs: Long, hiUs: Long): DataFrame = {
    require(hiUs > loUs, s"empty band [$loUs, $hiUs]")
    val width = hiUs - loUs
    // Shift the left axis by lo: s = lt + lo. A right row at rt matches
    // s ∈ [rt − width, rt], an interval of exactly one band width — so
    // it spans at most the two buckets floor(rt/width) − 1 and
    // floor(rt/width). Left emits its single bucket floor(s/width);
    // right emits both candidates (deduped when they coincide).
    val l = left
      .withColumn("__lt", unix_micros(leftTime.cast("timestamp")))
      .withColumn("__bucket", floor((col("__lt") + lit(loUs)) / lit(width)))
      .withColumn("__k", leftKey.cast("long"))
    val r = right
      .withColumn("__rt", unix_micros(rightTime.cast("timestamp")))
      .withColumn("__bucket", explode(array_distinct(array(
        floor(col("__rt") / lit(width)) - 1,
        floor(col("__rt") / lit(width))))))
      .withColumn("__rk", rightKey.cast("long"))
    l.join(r, col("__k") === col("__rk") && l("__bucket") === r("__bucket"))
      .filter((col("__rt") - col("__lt")).between(lit(loUs), lit(hiUs)))
      .drop("__lt", "__rt", "__bucket", "__k", "__rk")
  }
}
