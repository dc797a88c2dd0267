package graft.operators

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {

  private val shs = TextOps.shingles(TextOps.tokens("text"))

  test("shingles: 3-grams, distinct, empty for short docs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d"),     // "a b c", "b c d"
      (2L, "a b"),         // too short -> empty
      (3L, "x y x y x y") // repeats collapse via distinct: "x y x", "y x y"
    ).toDF("doc_id", "text")
    val out = df.selectExpr("doc_id", s"$shs AS s")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L).isEmpty)
    assert(out(3L) == Seq("x y x", "y x y"))
  }

  test("tokens split on arbitrary whitespace and trim") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "  a \t b\n c  ")).toDF("doc_id", "text")
    val out = df.selectExpr(s"${TextOps.tokens("text")} AS t")
      .collect()(0).getSeq[String](0)
    assert(out == Seq("a", "b", "c"))
  }

  test("band keys: 4 bands over a 12-entry signature") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1((1 to 12).map(i => s"h$i"))).toDF("mh")
    val out = df.selectExpr(s"${TextOps.bandKeys("mh")} AS b")
      .collect()(0).getSeq[String](0)
    assert(out.length == 4 && out.distinct.length == 4)
  }
}
