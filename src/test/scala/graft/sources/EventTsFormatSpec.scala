package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Regression guard for events.parquet timestamp-format drift.
  *
  * The driver has regenerated `/root/testdata` with three different
  * physical encodings for `ts` across rounds:
  *   INT64 TIMESTAMP(NANOS)            → LongType (nanosAsLong flag)
  *   TIMESTAMP(MICROS, adjusted=false) → TimestampNTZType
  *   TIMESTAMP(MICROS, adjusted=true)  → TimestampType
  * Round 8 shipped with only the first and third handled, so a testdata
  * regeneration silently killed every events-family query. These
  * committed fixtures (same rows, three encodings) pin the contract:
  * `Tables.events` must normalize all of them to identical
  * TimestampType values.
  */
class EventTsFormatSpec extends SparkSpec {

  private def fixtureDir(name: String): String = {
    val url = getClass.getResource(s"/events_fixtures/$name.parquet")
    assert(url != null, s"missing fixture $name")
    // Tables expects a dir containing events.parquet; stage a symlink-free
    // copy under a temp dir named the way the loader expects.
    val tmp = java.nio.file.Files.createTempDirectory(s"evfix_$name")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(url.toURI),
      tmp.resolve("events.parquet"))
    tmp.toString
  }

  private def load(name: String) =
    Tables(spark, fixtureDir(name)).events

  test("all three ts encodings normalize to TimestampType with equal values") {
    val frames = Seq("events_ntz", "events_nanos", "events_utc").map(load)
    frames.foreach { df =>
      assert(df.schema("ts").dataType == TimestampType, df.schema("ts"))
    }
    val expected = Seq(
      "2024-03-01 12:00:00", "2024-03-01 12:01:00", "2024-03-01 12:02:00",
      "2024-03-01 12:03:00", "2024-03-01 12:04:00")
    frames.foreach { df =>
      val got = df.orderBy("event_id")
        .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .collect().map(_.getString(0)).toSeq
      assert(got == expected)
    }
  }

  test("current driver testdata at sf0.001 loads and normalizes") {
    val ev = Tables(spark, SparkSpec.Sf0001).events
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.limit(1).count() == 1L)
  }
}
