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

  test("image payloads decode with the real JDK codec (PNG round-trip)") {
    // An 8×6 RGB image (top half black, bottom half white) written as
    // PNG by ImageIO itself: decodeFeatures must recover the TRUE
    // geometry — not the stub's hash-derived one — and the band-mean
    // luminance features (0.0 for the black band, 1.0 for the white).
    val img = new java.awt.image.BufferedImage(
      8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) {
      val v = if (y < 3) 0 else 255
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val s = spark
    import s.implicits._
    val df = Seq((1L, bos.toByteArray)).toDF("id", "payload")
    val r = Multimodal.decodeFeatures(df, "id", "payload", "image", featureDim = 2)
      .collect()(0)
    assert(r.width == 8 && r.height == 6 && r.channels == 3,
      s"real codec geometry expected, got ${r.width}x${r.height}x${r.channels}")
    assert(math.abs(r.features(0) - 0.0f) < 1e-6 &&
      math.abs(r.features(1) - 1.0f) < 1e-6,
      s"band luminance off: ${r.features.toSeq}")
  }

  test("audio payloads decode with the real JDK codec (WAV round-trip)") {
    // A 16-bit mono 8 kHz PCM clip (first half a full-scale square
    // wave, second half silence) written as WAV by javax.sound.sampled
    // itself: decodeFeatures must recover the TRUE geometry (frame
    // count, sample rate, channels) and the per-band RMS energy
    // (≈1.0 for the loud half, 0.0 for the silent half).
    val frames = 4000
    val pcm = new Array[Byte](frames * 2)
    for (i <- 0 until frames / 2) {
      val v: Short = if (i % 2 == 0) 32767 else -32768
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val s = spark
    import s.implicits._
    val df = Seq((1L, bos.toByteArray)).toDF("id", "payload")
    val r = Multimodal.decodeFeatures(df, "id", "payload", "audio", featureDim = 2)
      .collect()(0)
    assert(r.width == frames && r.height == 8000 && r.channels == 1,
      s"real codec geometry expected, got ${r.width}x${r.height}x${r.channels}")
    assert(r.features(0) > 0.99f && r.features(0) <= 1.01f &&
      math.abs(r.features(1)) < 1e-6, s"band RMS off: ${r.features.toSeq}")
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
