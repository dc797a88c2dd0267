package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    // Hot key 7 carries half the fact rows — the salting target.
    val fact = ((1 to 500).map(i => (7L, i.toLong, i * 1.5)) ++
      (1 to 500).map(i => ((i % 50).toLong, 1000L + i, i * 0.25)))
      .toDF("k", "row_id", "v")
    val dim = (0 to 60).map(i => (i.toLong, s"dim_$i")).toDF("dk", "name")
    (fact, dim)
  }

  test("salted join equals the plain inner join") {
    val (fact, dim) = fixture
    val plain = fact.join(dim, fact("k") === dim("dk")).drop("dk")
      .orderBy($"row_id").collect().toSeq
    val salted = SkewJoin.salted(fact, dim, "k", "dk", spread = col("row_id"), n = 8)
      .orderBy($"row_id").collect().toSeq
    assert(salted === plain)
  }

  test("fact keys missing from the dim drop out, as in a plain inner join") {
    val (fact, dim) = fixture
    val dimHalf = dim.where($"dk" < 25)
    val plainCnt = fact.join(dimHalf, fact("k") === dimHalf("dk")).count()
    val saltedCnt = SkewJoin.salted(fact, dimHalf, "k", "dk", col("row_id"), 4).count()
    assert(saltedCnt === plainCnt)
  }

  test("salt spreads a hot key over the widened join key") {
    val (fact, _) = fixture
    val spread = fact.where($"k" === 7L)
      .select(pmod(col("row_id").cast("long"), lit(8L)).as("salt"))
      .groupBy($"salt").count().collect()
    assert(spread.length === 8, "hot key should occupy all 8 salt cells")
  }

  test("negative spread values still salt into [0, n)") {
    val fact = Seq((1L, -5L, 1.0), (1L, -13L, 2.0)).toDF("k", "row_id", "v")
    val dim = Seq((1L, "x")).toDF("dk", "name")
    val out = SkewJoin.salted(fact, dim, "k", "dk", col("row_id"), 8)
    assert(out.count() === 2L)
  }
}
