package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("each left row picks the latest right value at or before its time") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "2024-01-01 10:00:00", "e1"),
      (1L, "2024-01-01 12:00:00", "e2"),
      (2L, "2024-01-01 10:00:00", "e3"),
      (3L, "2024-01-01 10:00:00", "e4") // key with no right rows -> null
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, "2024-01-01 09:00:00", "a"),
      (1L, "2024-01-01 11:00:00", "b"),
      (1L, "2024-01-01 13:00:00", "c"), // after every left row
      (2L, "2024-01-01 10:00:00", "d")  // exactly-at: inclusive
    ).toDF("k", "t", "v")
    val out = AsOfJoin.lastValueAsOf(
      left, col("k"), col("t"), right, col("k"), col("t"), col("v"), "vv")
      .select("ev", "vv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("e1" -> "a", "e2" -> "b", "e3" -> "d", "e4" -> null))
  }

  test("ties on (key, time) resolve deterministically to the max value") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "2024-01-01 10:00:00", "e")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, "2024-01-01 09:00:00", "x"),
      (1L, "2024-01-01 09:00:00", "z"),
      (1L, "2024-01-01 09:00:00", "y")
    ).toDF("k", "t", "v")
    val out = AsOfJoin.lastValueAsOf(
      left, col("k"), col("t"), right, col("k"), col("t"), col("v"), "vv")
      .select("vv").collect()(0).getString(0)
    assert(out == "z")
  }
}
