package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SchemaDescribeSpec extends SparkSpec {

  test("recursive type tree covers nested struct/array/map paths without scanning data") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, ("x", Seq(1, 2)), Map("a" -> 1.0)))
      .toDF("id", "nested", "attrs")
    val out = SchemaDescribe.describe(spark, df)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("id") == "bigint")
    assert(out("nested") == "struct")
    assert(out("nested._2") == "array")
    assert(out("nested._2[]") == "int")
    assert(out("attrs") == "map")
    assert(out("attrs{}") == "double")
  }

  test("field stats: exact null density in one scan") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b"))).toDF("id", "v")
    val out = SchemaDescribe.fieldStats(df)
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("non_null"), r.getAs[Long]("nulls"))).toMap
    assert(out("id") == (3L, 0L))
    assert(out("v") == (2L, 1L))
  }
}
