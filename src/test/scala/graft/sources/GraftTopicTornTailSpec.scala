package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSpec

/** Crash-shape robustness of the broker log: torn/garbled manifest
  * lines, dangling segment references, and abort-after-partial-commit
  * must all DEGRADE (stop at what exists / keep referenced data), never
  * throw or delete committed data. recordCount and the reader apply
  * identical validation, so admitted offsets never exceed what a scan
  * can produce.
  */
class GraftTopicTornTailSpec extends SparkSpec {

  private def broker(): String =
    Files.createTempDirectory("graft_torn").toString

  private def append(dir: String, topic: String, p: Int, s: String): Unit = {
    val path = Paths.get(GraftTopic.logFile(dir, topic, p))
    Files.createDirectories(path.getParent)
    Files.writeString(path, s, StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private val b64 = java.util.Base64.getEncoder
  private def inline(k: String, v: String, ts: Long): String =
    b64.encodeToString(k.getBytes) + "\t" + b64.encodeToString(v.getBytes) + s"\t$ts\n"

  test("recordCount stops at torn or garbled lines instead of throwing") {
    val dir = broker()
    val log = GraftTopic.logFile(dir, "t", 0)
    append(dir, "t", 0, inline("k1", "v1", 1) + inline("k2", "v2", 2))
    assert(GraftTopic.recordCount(log) == 2L)

    // Torn @ref merged with a later append: '@seg1\t' + '@seg2\t7\n'
    // puts '@seg2' in the count field — must read as torn tail, not
    // NumberFormatException.
    append(dir, "t", 0, "@segments/a.seg\t" + "@segments/b.seg\t7\n")
    assert(GraftTopic.recordCount(log) == 2L)
  }

  test("recordCount treats short inline lines and bad base64 as torn tail") {
    val dir = broker()
    val log = GraftTopic.logFile(dir, "t", 0)
    append(dir, "t", 0, inline("k1", "v1", 1))
    append(dir, "t", 0, "onlyonefield\n") // < 3 fields
    assert(GraftTopic.recordCount(log) == 1L)

    val dir2 = broker()
    val log2 = GraftTopic.logFile(dir2, "t", 0)
    append(dir2, "t", 0, inline("k1", "v1", 1))
    append(dir2, "t", 0, "!!notb64!!\t!!norb64!!\t5\n")
    assert(GraftTopic.recordCount(log2) == 1L)

    // Torn inline line merged with the next append: two records become
    // one garbled line; both sides must stop counting there.
    val dir3 = broker()
    val log3 = GraftTopic.logFile(dir3, "t", 0)
    append(dir3, "t", 0, inline("k1", "v1", 1))
    append(dir3, "t", 0, b64.encodeToString("k2".getBytes) + "\t" +
      inline("k3", "v3", 3)) // no newline between: 5 fields, ts field non-numeric
    assert(GraftTopic.recordCount(log3) == 1L)
  }

  test("recordCount treats a dangling segment ref (host crash) as torn tail") {
    val dir = broker()
    val log = GraftTopic.logFile(dir, "t", 0)
    append(dir, "t", 0, inline("k1", "v1", 1))
    append(dir, "t", 0, "@segments/never-synced.seg\t42\n")
    // The ref is durable but the segment bytes died with the page cache:
    // counting its 42 records would admit offsets no scan can produce.
    assert(GraftTopic.recordCount(log) == 1L)
  }

  test("a garbled manifest degrades the stream instead of killing it") {
    val dir = broker()
    GraftTopic.send(dir, "t", 1, "k1".getBytes, """{"a":1}""".getBytes, 100L)
    GraftTopic.send(dir, "t", 1, "k2".getBytes, """{"a":2}""".getBytes, 200L)
    append(dir, "t", 0, "@torn") // crash mid-append, no count field
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-topic")
      .option("brokerDir", dir).option("subscribe", "t")
      .option("startingOffsets", "earliest")
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got += b.count(); ()
      }.start()
    q.awaitTermination() // would throw here if the reader threw
    assert(got.sum == 2, s"expected the 2 intact records, got $got")
  }

  test("abort after partial commit deletes only UNREFERENCED segments") {
    val dir = broker()
    val cfg = GraftTopic.Config(dir, Seq("t"), 1, "earliest", None)
    val w = new GraftTopicStreamingWrite(cfg, "t", -1, 0, -1)
    def mkSeg(rel: String): Unit = {
      val p = Paths.get(dir, "t", rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, inline("k", "v", 1))
    }
    mkSeg("segments/a.seg"); mkSeg("segments/b.seg")
    val msgA = GraftTopicSegments(Seq(("t", 0, "segments/a.seg", 1L)))
    val msgB = GraftTopicSegments(Seq(("t", 0, "segments/b.seg", 1L)))
    // Commit lands A's ref, then "fails" before B. Spark then aborts the
    // epoch with ALL messages.
    w.commit(7L, Array(msgA))
    w.abort(7L, Array(msgA, msgB))
    // A is referenced by the manifest: deleting it would leave a
    // dangling ref that poisons the partition. B was never referenced.
    assert(Files.exists(Paths.get(dir, "t", "segments/a.seg")),
      "abort deleted a segment the manifest references")
    assert(!Files.exists(Paths.get(dir, "t", "segments/b.seg")),
      "abort leaked an unreferenced segment")
    assert(GraftTopic.recordCount(GraftTopic.logFile(dir, "t", 0)) == 1L)
  }
}
