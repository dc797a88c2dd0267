package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Semantic properties of the corpus-curation family
  * (PipelineQueries): eval isolation in decontamination, the
  * deterministic-bucket law in stratified sampling, share/weight
  * arithmetic in mix weights, and redaction completeness in the PII
  * scan. The DuckDB value gate is tools/check.py; these assert the
  * invariants a hash compare can't see.
  */
class PipelineQueriesSpec extends SparkSpec {

  private val dir = SparkSpec.Sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("decontaminate: only non-eval docs flagged, every overlap positive") {
    val out = run("q_docs_decontaminate").collect()
    assert(out.nonEmpty, "vacuous decontamination output at sf0.001")
    assert(out.forall(_.getLong(0) % 7 != 0), "eval docs must not flag themselves")
    assert(out.forall(_.getLong(1) >= 1))
  }

  test("decontaminate: eval n-gram index is broadcast, corpus side never shuffles text") {
    val plan = run("q_docs_decontaminate").queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"),
      s"eval index should broadcast:\n$plan")
    // The only exchange should carry (doc_id, count) — grouping — never
    // the exploded n-gram stream joined shuffle-side.
    assert(!plan.contains("SortMergeJoin"), s"corpus side fell into SMJ:\n$plan")
  }

  test("stratified sample: every kept row obeys its stratum's md5-bucket law") {
    val out = run("q_docs_stratified_sample")
      .withColumn("bucket", substring(md5(col("doc_id").cast("string")), 1, 2))
      .collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val thr = if (r.getString(1) == "en") "80" else "33"
      r.getAs[String]("bucket") < thr
    })
  }

  test("stratified sample: deterministic across runs") {
    val a = rows(run("q_docs_stratified_sample"))
    val b = rows(run("q_docs_stratified_sample"))
    assert(a === b)
  }

  test("mix weights: shares are consistent and weights invert them") {
    val out = run("q_docs_mix_weights").collect()
    assert(math.abs(out.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-4)
    out.foreach { r =>
      val expected = r.getAs[Double]("target_share") / r.getAs[Double]("token_share")
      assert(math.abs(r.getAs[Double]("mix_weight") - expected) < 1e-4)
    }
    val en = out.find(_.getString(0) == "en").get
    assert(en.getAs[Double]("target_share") == 0.4)
  }

  test("pii scan: counts follow the residue classes that inject them") {
    val out = run("q_text_pii_scan").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert((r.getAs[Long]("email_cnt") >= 1) == (id % 7 == 0), s"email residue at $id")
      assert((r.getAs[Long]("phone_cnt") >= 1) == (id % 11 == 0), s"phone residue at $id")
      assert((r.getAs[Long]("ip_cnt") >= 1) == (id % 13 == 0), s"ip residue at $id")
    }
  }

  test("pii scan: redaction is complete — no pattern survives its own scrub") {
    // Re-run the scrubber standalone and re-scan the REDACTED text: every
    // detector must come back zero (the property the digest can't prove).
    import graft.sources.Tables
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
    val phone = "[0-9]{3}-[0-9]{4}"
    val ip = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
    val residue = Tables(spark, dir).documents
      .withColumn("aug", concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com now")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" today")))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit("."),
            (col("doc_id") * 7 % 256).cast("string"), lit(" logged")))
          .otherwise(lit(""))))
      .withColumn("red",
        regexp_replace(regexp_replace(regexp_replace(col("aug"),
          email, "[EMAIL]"), ip, "[IP]"), phone, "[PHONE]"))
      .filter(
        size(regexp_extract_all(col("red"), lit(email), lit(0))) > 0 ||
        size(regexp_extract_all(col("red"), lit(phone), lit(0))) > 0 ||
        size(regexp_extract_all(col("red"), lit(ip), lit(0))) > 0)
      .count()
    assert(residue === 0L)
  }
}
