package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata, decoded/featurized in
  * distributed per-partition batches (builder-prompt first-class family;
  * no reference counterpart).
  *
  * The Spark side is real — schema, `mapPartitions` batch iteration,
  * partition-parallel execution, column pruning down to (id, payload).
  * IMAGE payloads decode with a REAL codec: the JDK's own
  * `javax.imageio` (PNG/JPEG/GIF/BMP ship with every JRE — no new
  * dependency), yielding true width/height/channels and a pixel
  * statistic feature vector. Payloads ImageIO cannot read (video,
  * audio, arbitrary bytes) fall back to the clearly-marked
  * DETERMINISTIC STUB (`fakeDecode`) — the container ships no
  * video/audio codecs; swap the fallback for ffmpeg/javacv without
  * touching any plumbing. Per-partition batching amortizes codec init
  * exactly like a Pandas-UDF batch would.
  */
object Multimodal {

  case class MediaFeatures(
      id: Long,
      kind: String,
      byte_len: Int,
      width: Int,
      height: Int,
      channels: Int,
      features: Array[Float])

  case class Frame(id: Long, frame_idx: Int, offset: Long, frame: Array[Byte])

  /** STUB decode: derives a plausible (width, height, channels) and a
    * fixed-length feature vector deterministically from the payload
    * bytes. Replace with a real codec; signature and batching stay. */
  private[operators] def fakeDecode(bytes: Array[Byte], featureDim: Int): (Int, Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 16 + math.floorMod(h, 16) * 16
    val height = 16 + math.floorMod(h >> 8, 16) * 16
    val channels = 1 + math.floorMod(h >> 16, 3)
    val features = new Array[Float](featureDim)
    var i = 0
    while (i < featureDim) {
      // Rolling byte statistic per feature slot — deterministic in input.
      var acc = 0
      var j = i
      while (j < bytes.length) { acc = acc * 31 + (bytes(j) & 0xff); j += featureDim }
      features(i) = (math.floorMod(acc, 1000) / 1000.0f)
      i += 1
    }
    (width, height, channels, features)
  }

  /** Pixel-count cap enforced from the HEADER, before any raster
    * materializes: `ImageReader.read` allocates the full w×h raster
    * even though the featurizer samples a bounded grid, so a tiny
    * adversarial payload declaring huge dimensions would otherwise
    * allocate gigabytes (or OOM) inside a task. 64 MP ≈ 256 MB ARGB —
    * generous for real images, fatal-proof for fakes. */
  private val MaxImagePixels = 64L * 1000 * 1000

  /** REAL image decode via `javax.imageio`: true geometry from the
    * codec (width, height, color-model component count) and a real
    * pixel statistic as the feature vector — mean luminance of
    * `featureDim` horizontal bands, sampled on a bounded grid (≤ 64
    * positions per axis) so a huge image costs O(grid), not O(pixels).
    * The header is read FIRST and payloads declaring more than
    * [[MaxImagePixels]] are rejected before the raster allocates.
    * None when ImageIO has no codec for the payload (video/audio/
    * arbitrary bytes) or it fails the cap — the caller falls back to
    * the stub. Only non-fatal failures map to the fallback: an OOM or
    * JVM error must surface, not masquerade as stub features. */
  private[operators] def imageDecode(bytes: Array[Byte], featureDim: Int)
      : Option[(Int, Int, Int, Array[Float])] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      if (iis == null) return None
      val img =
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return None // no codec for this payload
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            // Header-only reads: no pixel data touched yet.
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxImagePixels) return None
            reader.read(0)
          } finally reader.dispose()
        } finally iis.close()
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val channels = img.getColorModel.getNumComponents
        val features = new Array[Float](featureDim)
        val counts = new Array[Int](featureDim)
        val xs = math.min(w, 64)
        val ys = math.min(h, 64)
        var yi = 0
        while (yi < ys) {
          val y = (yi.toLong * h / ys).toInt
          val band = math.min(featureDim - 1, yi * featureDim / ys)
          var xi = 0
          while (xi < xs) {
            val x = (xi.toLong * w / xs).toInt
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            features(band) += lum / 255.0f
            counts(band) += 1
            xi += 1
          }
          yi += 1
        }
        var i = 0
        while (i < featureDim) {
          if (counts(i) > 0) features(i) /= counts(i)
          i += 1
        }
        Some((w, h, channels, features))
      }
    } catch { case scala.util.control.NonFatal(_) => None } // corrupt stream → fallback

  /** Bound on PCM frames the audio featurizer reads per payload: work
    * per row is O(cap), not O(clip length) — a pathological multi-hour
    * clip costs the same as a minute. 16 kHz mono ≈ 60 s of audio. */
  private val MaxAudioFrames = 1L * 1000 * 1000

  /** REAL audio decode via `javax.sound.sampled` (WAV/AIFF/AU parsers
    * ship with every JRE — no new dependency): true (sample rate,
    * channel count, frame count) from the container header, and a real
    * signal statistic as the feature vector — RMS ENERGY of
    * `featureDim` consecutive time bands over the (bounded) PCM frames.
    * The image-shaped MediaFeatures fields carry the audio geometry:
    * width = frames read, height = sample rate in Hz, channels =
    * channels. None when the payload is not a supported audio container
    * or not integer PCM — the caller falls through to the stub. */
  private[operators] def audioDecode(bytes: Array[Byte], featureDim: Int)
      : Option[(Int, Int, Int, Array[Float])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!signed && enc != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
          return None // compressed payload: no codec in the JRE for it
        val bits = fmt.getSampleSizeInBits
        if (bits != 8 && bits != 16) return None
        val channels = fmt.getChannels
        val frameBytes = fmt.getFrameSize
        val totalFrames = math.min(
          if (in.getFrameLength >= 0) in.getFrameLength else MaxAudioFrames,
          MaxAudioFrames).toInt
        if (totalFrames <= 0 || frameBytes <= 0) return None
        val features = new Array[Float](featureDim)
        val counts = new Array[Int](featureDim)
        val buf = new Array[Byte](frameBytes * 4096)
        var frame = 0
        var eof = false
        while (frame < totalFrames && !eof) {
          val want = math.min(buf.length, (totalFrames - frame) * frameBytes)
          val n = in.readNBytes(buf, 0, want)
          if (n < frameBytes) eof = true
          var off = 0
          while (off + frameBytes <= n) {
            // Mean-square over ALL channel samples of the frame,
            // normalized to [-1, 1] amplitude.
            var acc = 0.0
            var ch = 0
            while (ch < channels) {
              val so = off + ch * (bits / 8)
              val amp =
                if (bits == 8) {
                  val raw = buf(so).toInt
                  (if (signed) raw else (raw & 0xff) - 128) / 128.0
                } else {
                  val lo = buf(if (fmt.isBigEndian) so + 1 else so) & 0xff
                  val hi = buf(if (fmt.isBigEndian) so else so + 1)
                  val v = if (signed) (hi.toInt << 8) | lo // sign-extends
                          else (((hi & 0xff) << 8) | lo) - 32768
                  v / 32768.0
                }
              acc += amp * amp
              ch += 1
            }
            val band = math.min(featureDim - 1,
              (frame.toLong * featureDim / totalFrames).toInt)
            features(band) += (acc / channels).toFloat
            counts(band) += 1
            frame += 1
            off += frameBytes
          }
        }
        var i = 0
        while (i < featureDim) {
          if (counts(i) > 0) features(i) = math.sqrt(features(i) / counts(i)).toFloat
          i += 1
        }
        Some((frame, fmt.getSampleRate.toInt, channels, features))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None } // not audio / torn header → fallback

  /** Decode + featurize a binary payload column: real JRE codecs first
    * (ImageIO for images, javax.sound.sampled for PCM audio), stub for
    * everything neither can read (video — the container ships no video
    * codec). Runs per-partition so a real decoder initializes once per
    * task, not per row. */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String,
                     kind: String, featureDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // (a codec with per-task init would open once here and close
        // via a task-completion listener; both JRE codecs are stateless)
        it.map { case (id, bytes) =>
          val (w, h, c, f) = imageDecode(bytes, featureDim)
            .orElse(audioDecode(bytes, featureDim))
            .getOrElse(fakeDecode(bytes, featureDim))
          MediaFeatures(id, kind, bytes.length, w, h, c, f)
        }
      }
  }

  case class Resized(id: Long, width: Int, height: Int, pixels: Array[Byte])

  /** STUB resize: nearest-neighbor downsample over the byte grid the
    * fake decode implies (payload bytes laid out row-major at the
    * decoded width). Deterministic in input; replace the sampling loop
    * with a real scaler without touching the plumbing. */
  def resize(df: DataFrame, idCol: String, payloadCol: String,
             outW: Int, outH: Int): Dataset[Resized] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = new Array[Byte](outW * outH)
          if (bytes.nonEmpty) {
            val (w, h, _, _) = fakeDecode(bytes, 1)
            var y = 0
            while (y < outH) {
              var x = 0
              while (x < outW) {
                val sx = x.toLong * w / outW
                val sy = y.toLong * h / outH
                out(y * outW + x) = bytes(((sy * w + sx) % bytes.length).toInt)
                x += 1
              }
              y += 1
            }
          }
          Resized(id, outW, outH, out)
        }
      }
  }

  /** Frame sampling for "video" payloads: n evenly spaced fixed-size
    * windows over the byte stream — one output row per frame, ready for
    * a per-frame decode stage downstream. */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
                  frames: Int, frameBytes: Int = 16): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes.isEmpty) Iterator.empty
        else {
          val n = math.min(frames, math.max(1, bytes.length / frameBytes))
          (0 until n).iterator.map { i =>
            val off = (bytes.length - frameBytes).max(0).toLong * i / math.max(1, n - 1).toLong
            val end = math.min(off.toInt + frameBytes, bytes.length)
            Frame(id, i, off, java.util.Arrays.copyOfRange(bytes, off.toInt, end))
          }
        }
      }
  }
}
