package graft.api

import graft.SparkSpec
import graft.sources.Tables

class TypedTablesSpec extends SparkSpec {

  private def t = Tables(spark, graft.SparkSpec.Sf0001)

  test("every table decodes into its case class") {
    assert(TypedTables.customers(t).head().c_custkey >= 0)
    assert(TypedTables.orders(t).head().o_totalprice > 0)
    assert(TypedTables.documents(t).head().text.nonEmpty)
    assert(TypedTables.embeddings(t).head().embedding.length == 64)
    assert(TypedTables.events(t).head().event_id >= 0)
  }

  test("typed filters compose with column plans") {
    val s = spark
    import s.implicits._
    val ds = TypedTables.customers(t)
    val negative = ds.filter(_.c_acctbal < 0)
    val viaColumns = ds.filter(org.apache.spark.sql.functions.col("c_acctbal") < 0)
    assert(negative.count() == viaColumns.count())
  }
}
