package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, SparkSpec => S}
import graft.sources.{Tables, TxTable}
import org.apache.spark.sql.functions._

/** User-data erasure: one pruned keyed replace per table removes every
  * trace of the users, rewrites only the files whose manifest user_id
  * bounds admit them (the user-clustered z-order layout is what makes
  * that a strict subset on a time-ordered event log), and leaves all
  * other rows byte-identical.
  */
class EventStoreEraseSpec extends SparkSpec {

  test("eraseUsers removes every trace; user-clustered layout bounds the rewrite") {
    val root = Files.createTempDirectory("graft_erase").toString
    val store = new EventStore(root)
    val events = Tables(spark, S.Sf0001).events
    (0 until 4).foreach { i =>
      store.appendFacts(events.filter(col("event_id") % 4 === i).repartition(3))
    }
    // Derived summary + user dimension, as the ingest maintains them.
    store.mergeSummary(events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("event_cnt"),
        sum(col("value")).cast("decimal(18,2)").as("total_value"),
        max(col("ts")).as("last_ts")))
    store.clusterSummary(spark, files = 4)
    store.insertIfAbsent("dim_user", events.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_seen")), "user_id")
    // (time × user) rectangles: the layout that bounds erasure cost.
    val t = s"$root/fact_events"
    val bytes = TxTable.dataFiles(t, TxTable.snapshot(t))
      .map(f => Files.size(f._1)).sum
    store.compactFacts(spark, targetBytes = bytes / 8 + 1,
      zorder = true, zorderIdCol = "user_id")

    val users = events.select(col("user_id")).distinct().orderBy("user_id")
      .limit(2).collect().map(_.getLong(0)).toSeq
    val before = store.facts(spark)
      .orderBy("event_id").collect().toSeq
    val victims = before.count(r => users.contains(r.getLong(r.fieldIndex("user_id"))))
    assert(victims > 0, "chosen users have no fact rows — bad fixture slice")

    val res = store.eraseUsers(spark, users)

    val after = store.facts(spark).orderBy("event_id").collect().toSeq
    assert(after === before.filterNot(r =>
      users.contains(r.getLong(r.fieldIndex("user_id")))),
      "erasure touched rows beyond the removed users")
    val (rw, tot) = res("fact_events")
    assert(rw > 0 && rw < tot,
      s"user-clustered erasure should rewrite a strict file subset: $rw of $tot")
    Seq("summary_user", "dim_user").foreach { name =>
      assert(store.table(spark, name)
        .filter(col("user_id").isin(users: _*)).count() == 0,
        s"$name still carries an erased user")
      assert(store.table(spark, name).count() > 0,
        s"erasure emptied $name")
    }
  }
}
