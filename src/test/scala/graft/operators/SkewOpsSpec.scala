package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {

  // 10k rows, 90% on one hot key — the shape that serializes a reducer.
  private def skewed = {
    val s = spark
    import s.implicits._
    spark.range(10000)
      .select(
        when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id") % 100).as("k"),
        (col("id") % 7).as("v"))
  }

  private def dim = {
    val s = spark
    import s.implicits._
    spark.range(100).select(col("id").as("dk"), concat(lit("name"), col("id")).as("name"))
  }

  test("salted join equals plain join") {
    val plain = skewed.join(dim, col("k") === col("dk"))
      .groupBy(col("k")).agg(count(lit(1)).as("c"), sum("v").as("s"))
    val salted = SkewOps.saltedJoin(skewed, col("k"), dim, col("dk"), saltFactor = 8)
      .groupBy(col("k")).agg(count(lit(1)).as("c"), sum("v").as("s"))
    assert(rows(salted.orderBy("k")) == rows(plain.orderBy("k")))
  }

  test("salted join spreads the hot key across salt sub-keys") {
    val bigS = skewed.withColumn("__salt",
      pmod(hash(struct(skewed.columns.map(col).toSeq: _*)), lit(8)))
    val saltsUsed = bigS.filter(col("k") === 1).select("__salt").distinct().count()
    assert(saltsUsed >= 6, s"hot key only landed on $saltsUsed of 8 salts")
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val direct = skewed.groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"), sum("v").as("total"))
    val salted = SkewOps.saltedAgg(skewed, col("k"), saltFactor = 8,
      partialAggs = Seq("cnt" -> count(lit(1)), "total" -> sum("v")),
      finalAggs = Seq("cnt" -> sum("cnt"), "total" -> sum("total")))
      .withColumnRenamed("__k", "k")
    assert(rows(salted.orderBy("k")) == rows(direct.orderBy("k")))
  }
}
