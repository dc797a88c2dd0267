package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def payloads = {
    val s = spark
    import s.implicits._
    Seq((1L, "abcdefgh" * 8), (2L, "zyxw" * 32), (3L, "q"))
      .toDF("id", "txt")
      .select(col("id"), col("txt").cast("binary").as("payload"))
  }

  test("decodeFeatures: typed schema, deterministic stub, fixed feature dim") {
    val out = Multimodal.decodeFeatures(payloads, "id", "payload", "image", featureDim = 8)
    val rows1 = out.collect().sortBy(_.id)
    val rows2 = Multimodal.decodeFeatures(payloads, "id", "payload", "image", 8)
      .collect().sortBy(_.id)
    assert(rows1.length == 3)
    assert(rows1.forall(_.features.length == 8))
    assert(rows1.forall(r => r.width > 0 && r.height > 0 && (1 to 3).contains(r.channels)))
    assert(rows1.map(_.features.toSeq) sameElements rows2.map(_.features.toSeq))
    assert(rows1.map(r => r.id -> r.byte_len).toMap == Map(1L -> 64, 2L -> 128, 3L -> 1))
  }

  test("frameSample: n evenly spaced frames, in-bounds, ordered") {
    val out = Multimodal.frameSample(payloads, "id", "payload", frames = 4, frameBytes = 16)
      .collect().groupBy(_.id)
    assert(out(1L).length == 4)
    assert(out(1L).map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
    assert(out(1L).forall(_.frame.length <= 16))
    assert(out(1L).map(_.offset).toSeq == out(1L).map(_.offset).toSeq.sorted)
    // Tiny payload: fewer frames than requested, never out of bounds.
    assert(out(3L).length == 1 && out(3L)(0).frame.length == 1)
  }

  test("resize: fixed output geometry, deterministic, empty-safe") {
    val a = Multimodal.resize(payloads, "id", "payload", 8, 4).collect().sortBy(_.id)
    val b = Multimodal.resize(payloads, "id", "payload", 8, 4).collect().sortBy(_.id)
    assert(a.forall(r => r.width == 8 && r.height == 4 && r.pixels.length == 32))
    assert(a.map(_.pixels.toSeq) sameElements b.map(_.pixels.toSeq))
    val s = spark
    import s.implicits._
    val empty = Seq((9L, Array.empty[Byte])).toDF("id", "payload")
    assert(Multimodal.resize(empty, "id", "payload", 4, 4).collect()(0).pixels.forall(_ == 0))
  }

  test("column pruning reaches the scan (only id + payload read)") {
    val wide = payloads.withColumn("unused", lit("x"))
    val plan = Multimodal.decodeFeatures(wide, "id", "payload", "image")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("unused"))
  }
}
