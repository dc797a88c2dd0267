package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property test for the DF-capped shingle inverted index
  * (DedupQueries.cappedShinglePairs): a corpus-wide boilerplate shingle
  * must NOT turn candidate generation quadratic.
  */
class DedupCapSpec extends SparkSpec {
  import spark.implicits._

  test("a shingle shared by every doc generates zero candidate pairs") {
    // Adversarial fixture: 200 docs all share one boilerplate shingle
    // (DF 200 > cap 128); each also has a unique shingle (DF 1).
    // Uncapped candidate gen would emit 200*199/2 = 19900 pairs from the
    // boilerplate bucket alone; the cap drops the bucket entirely.
    val n = 200
    val inv = (0 until n).flatMap(i =>
      Seq((i.toLong, "common boilerplate shingle"), (i.toLong, s"unique shingle $i")))
      .toDF("doc_id", "sh")
    assert(DedupQueries.cappedShinglePairs(inv).count() === 0L)
  }

  test("rare shared shingles still produce their candidate pairs") {
    val inv = Seq(
      (1L, "shared rare"), (2L, "shared rare"),
      (1L, "only one"), (3L, "another solo")).toDF("doc_id", "sh")
    val pairs = rows(DedupQueries.cappedShinglePairs(inv))
    assert(pairs === Seq(Seq(1L, 2L)))
  }

  test("candidate count is bounded by sum over kept shingles of df^2/2") {
    // Mixed corpus: one hot shingle (df 150 > cap, dropped), several
    // mid-frequency shingles (df 10, kept). The candidate total must be
    // bounded by the kept buckets only — linear in docs for bounded df,
    // independent of the hot shingle.
    val hot = (0 until 150).map(i => (i.toLong, "hot"))
    val mid = (0 until 50).map(i => (i.toLong, s"mid ${i % 5}")) // 5 shingles, df 10 each
    val inv = (hot ++ mid).toDF("doc_id", "sh")
    val got = DedupQueries.cappedShinglePairs(inv).count()
    val bound = 5L * (10L * 9L / 2L) // Σ df·(df−1)/2 over kept shingles
    assert(got <= bound)
    assert(got === bound) // distinct docs per bucket here, so exact
  }
}
