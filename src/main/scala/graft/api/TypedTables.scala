package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Typed `Dataset[T]` views of the star tables — case-class Encoders
  * where compile-time safety helps the API layer (filters/maps over
  * named fields); the query library itself stays `DataFrame`-based so
  * Catalyst sees every column reference (typed `map`/`filter` lambdas
  * are opaque to the optimizer — use columns inside plans, types at the
  * boundary).
  */
object TypedTables {

  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                            c_acctbal: Double, c_mktsegment: String)
  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                         o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                         o_orderpriority: String)
  final case class Document(doc_id: Long, text: String, lang: String,
                            source: String, n_chars: Long)
  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
  final case class Event(event_id: Long, user_id: Long, event_type: String,
                         value: Double, ts: java.sql.Timestamp, props: String)

  def customers(t: Tables): Dataset[Customer] = {
    val spark = t.spark; import spark.implicits._
    t.customer.as[Customer]
  }

  def orders(t: Tables): Dataset[Order] = {
    val spark = t.spark; import spark.implicits._
    t.orders.as[Order]
  }

  def documents(t: Tables): Dataset[Document] = {
    val spark = t.spark; import spark.implicits._
    t.documents.as[Document]
  }

  def embeddings(t: Tables): Dataset[Embedding] = {
    val spark = t.spark; import spark.implicits._
    t.embeddings.as[Embedding]
  }

  def events(t: Tables): Dataset[Event] = {
    val spark = t.spark; import spark.implicits._
    t.events.select(col("event_id"), col("user_id"), col("event_type"),
      col("value"), col("ts"), col("props")).as[Event]
  }
}
