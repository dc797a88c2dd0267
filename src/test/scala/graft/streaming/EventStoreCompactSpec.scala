package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, SparkSpec => S}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class EventStoreCompactSpec extends SparkSpec {

  test("compaction bin-packs the fact store without changing its contents") {
    val root = Files.createTempDirectory("graft_compact").toString
    val store = new EventStore(root)
    val events = Tables(spark, S.Sf0001).events
    // Five separate appends, each multi-partition → many small files.
    (0 until 5).foreach { i =>
      store.appendFacts(events.filter(col("event_id") % 5 === i).repartition(4))
    }
    val beforeRows = store.facts(spark).orderBy("event_id").collect().toSeq
    val (before, after) = store.compactFacts(spark)
    assert(before >= 20L, s"expected many small files, saw $before")
    assert(after == 1L, s"tiny store should compact to one file, saw $after")
    val afterRows = store.facts(spark).orderBy("event_id").collect().toSeq
    assert(afterRows == beforeRows)
    // Idempotent: already-compact store is left alone.
    assert(store.compactFacts(spark) == ((1L, 1L)))
  }
}
