package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CollectCappedSpec extends SparkSpec {
  import spark.implicits._

  test("matches sort_array(collect_set) exactly for groups within the cap") {
    val df = (0 until 5000).map(i => (s"k${i % 97}", (i % 41).toLong))
      .toDF("k", "v").repartition(8) // force partial merge across partitions
    val capped = df.groupBy("k")
      .agg(expr("graft_collect_capped(v, 128)").as("ids"))
    val reference = df.groupBy("k")
      .agg(sort_array(collect_set(col("v"))).as("ids"))
    assert(rows(capped.orderBy("k")) == rows(reference.orderBy("k")))
  }

  test("groups past the cap collapse to NULL with bounded state, others survive") {
    // one hot key with 1000 distinct values (cap 128), one rare key.
    val df = ((0 until 1000).map(i => ("hot", i.toLong)) ++
      Seq(("rare", 1L), ("rare", 2L), ("rare", 1L))).toDF("k", "v").repartition(8)
    val out = df.groupBy("k")
      .agg(expr("graft_collect_capped(v, 128)").as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("hot").isEmpty)
    assert(out("rare").map(_.asInstanceOf[scala.collection.Seq[Long]].toSeq) == Some(Seq(1L, 2L)))
  }

  test("null inputs are ignored; all-null group yields an empty array") {
    val df = Seq(("a", Some(3L)), ("a", None), ("b", None))
      .toDF("k", "v").repartition(4)
    val out = df.groupBy("k")
      .agg(expr("graft_collect_capped(v, 16)").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a") == Seq(3L))
    assert(out("b") == Seq.empty)
  }

  test("duplicate-heavy hot keys stay capped by DISTINCT count, not row count") {
    // 100k rows but only 3 distinct values: must NOT overflow cap 16.
    val df = (0 until 100000).map(i => ("k", (i % 3).toLong)).toDF("k", "v")
      .repartition(8)
    val out = df.groupBy("k")
      .agg(expr("graft_collect_capped(v, 16)").as("ids"))
      .collect()(0).getSeq[Long](1)
    assert(out == Seq(0L, 1L, 2L))
  }
}
