package graft.functions

import graft.SparkSpec
import graft.operators.TextOps

/** The native kernels must be bit-identical to the portable SQL
  * higher-order-function formulations — that equivalence is what lets the
  * DuckDB oracle (which mirrors the SQL formulation) keep validating
  * queries that run the native path.
  */
class NativeExprSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content here now"),
      (4L, "short"),          // < 3 tokens -> empty shingle set
      (5L, "a b c")
    ).toDF("doc_id", "text")
  }

  private val shs = TextOps.shingles(TextOps.tokens("text"))

  test("graft_minhash matches the SQL HOF minhash signature") {
    val native = docs.selectExpr("doc_id", s"graft_minhash($shs, 12) AS mh")
    val sql = docs.selectExpr("doc_id", s"${TextOps.minhashSignature(shs)} AS mh")
    assert(rows(native.orderBy("doc_id")) == rows(sql.orderBy("doc_id")))
  }

  test("graft_simhash32 matches the SQL HOF simhash") {
    val native = docs.selectExpr("doc_id", s"graft_simhash32($shs) AS sh")
    val sql = docs.selectExpr("doc_id", s"${TextOps.simhash32(shs)} AS sh")
    assert(rows(native.orderBy("doc_id")) == rows(sql.orderBy("doc_id")))
  }

  test("simhash of identical content is identical; near-identical within hamming 3") {
    val out = docs.selectExpr("doc_id", s"graft_simhash32($shs) AS sh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc1 vs doc2 differ in one trailing word out of 7 shingles
    val hamming = java.lang.Long.bitCount(out(1L) ^ out(2L))
    assert(hamming <= 8, s"near-dup hamming too large: $hamming")
    assert(java.lang.Long.bitCount(out(1L) ^ out(3L)) > hamming)
  }

  test("graft_minhash on empty shingle set yields k nulls (as SQL does)") {
    val r = docs.filter("doc_id = 4")
      .selectExpr(s"graft_minhash($shs, 12) AS mh")
      .collect()(0).getSeq[String](0)
    assert(r.length == 12 && r.forall(_ == null))
  }

  test("graft_dot matches the SQL fold and plain math") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val native = df.selectExpr("graft_dot(a, b) AS d").collect()(0).getDouble(0)
    val sql = df.selectExpr(
      s"${graft.operators.VectorOps.dotApprox("a", "b")} AS d").collect()(0).getDouble(0)
    assert(native == sql && native == 32.0)
  }

  test("null ELEMENTS match the SQL formulations (skip in minhash, -1 bits in simhash)") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(Seq(Some("a"), None, Some("b")))).toDF("arr")
      .selectExpr("CAST(arr AS array<string>) AS arr")
    val native = df.selectExpr(
      "graft_minhash(arr, 4) AS mh", "graft_simhash32(arr) AS sh")
    val sql = df.selectExpr(
      s"${TextOps.minhashSignature("arr", 4)} AS mh",
      s"${TextOps.simhash32("arr")} AS sh")
    assert(rows(native) == rows(sql))
  }

  test("null inputs propagate as null") {
    val r = spark.sql(
      "SELECT graft_simhash32(CAST(NULL AS array<string>)) AS a, " +
      "graft_minhash(CAST(NULL AS array<string>), 4) AS b, " +
      "graft_dot(CAST(NULL AS array<double>), array(CAST(1.0 AS DOUBLE))) AS c").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
