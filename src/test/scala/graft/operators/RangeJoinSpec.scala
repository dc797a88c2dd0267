package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class RangeJoinSpec extends SparkSpec {

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("band join equals naive theta join on random data") {
    val s = spark
    import s.implicits._
    val gen = for {
      n <- Gen.const(40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(1L, 5L); t <- Gen.chooseNum(0L, 500L)
      } yield (k, t * 1000000L))
    } yield rows
    (0 until 5).foreach { i =>
      val leftRows = gen.pureApply(Gen.Parameters.default, Seed(100L + i))
      val rightRows = gen.pureApply(Gen.Parameters.default, Seed(200L + i))
      val left = leftRows.zipWithIndex.map { case ((k, t), id) => (id.toLong, k, ts(t)) }
        .toDF("lid", "lk", "lt")
      val right = rightRows.zipWithIndex.map { case ((k, t), id) => (id.toLong, k, ts(t)) }
        .toDF("rid", "rk", "rt")
      val (lo, hi) = (10L * 1000000, 60L * 1000000)
      val banded = RangeJoin.bandJoin(left, col("lk"), col("lt"), right, col("rk"), col("rt"), lo, hi)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = left.join(right, col("lk") === col("rk") &&
          (unix_micros(col("rt")) - unix_micros(col("lt"))).between(lo, hi))
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == naive, s"iteration $i: band join diverged from theta join")
    }
  }

  test("band bounds are inclusive on both ends") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 1L, ts(0L))).toDF("lid", "lk", "lt")
    val right = Seq(
      (1L, 1L, ts(10L * 1000000)),      // exactly lo
      (2L, 1L, ts(60L * 1000000)),      // exactly hi
      (3L, 1L, ts(61L * 1000000)),      // just outside
      (4L, 1L, ts(9L * 1000000))        // just outside
    ).toDF("rid", "rk", "rt")
    val out = RangeJoin.bandJoin(left, col("lk"), col("lt"), right, col("rk"), col("rt"),
      10L * 1000000, 60L * 1000000)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L))
  }
}
