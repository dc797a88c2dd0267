package graft.sources

import java.io.{BufferedReader, FileReader, FileWriter}
import java.nio.file.{Files, Paths}
import java.util.{Base64, UUID}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-topic`: a file-backed streaming DataSourceV2 with the Kafka
  * source's OPTION SURFACE and WIRE SCHEMA — the layer the sandbox's
  * missing connector jar left unexecuted (KAFKA_PROBE.md): a real
  * MicroBatchStream with offset tracking, admission control
  * (`maxOffsetsPerTrigger`), checkpoint restart recovery, and
  * `startingOffsets` semantics, end-to-end executable here. Everything
  * downstream is unchanged: `load()` returns KafkaWire.wireSchema rows,
  * so `KafkaWire.parseEvents` → `StreamIngest.applyBatch` consume it
  * exactly as they would the Kafka source (reference
  * streaming/consumer.py:23-33 — subscribe list, offset reset, the
  * consumer poll loop whose progress the checkpoint replaces).
  *
  * Broker model: `brokerDir/<topic>/p<k>.log`, one append-only MANIFEST
  * per partition. A manifest line is either an inline record
  * `base64(key)\tbase64(value)\tts` (the lightweight [[GraftTopic.send]]
  * producer) or a segment reference `@<relPath>\t<count>` naming an
  * immutable file of `count` records under the topic dir (the streaming
  * sink's epoch commit — Kafka's own log-segment shape). A record's
  * OFFSET is its position in the flattened sequence, so offsets are
  * dense, monotone in commit order across both producers, and a
  * (start, end] range is immutable and replayable — which is what makes
  * checkpoint recovery exact. Readers skip whole segments by count
  * without opening them; `latestOffset` sums manifest entries (a real
  * broker indexes; at spec scale the scan is the honest,
  * obviously-correct choice).
  *
  * Options: `brokerDir`, `subscribe` (comma-separated topics),
  * `partitions` (per topic, default 1), `startingOffsets`
  * (earliest|latest), `maxOffsetsPerTrigger` (total rows per batch,
  * prorated across partitions by availability like the Kafka source).
  */
class GraftTopicProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-topic"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.streaming.KafkaWire.wireSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GraftTopicTable(GraftTopic.config(
      new CaseInsensitiveStringMap(properties)))
}

private[sources] final class GraftTopicTable(cfg: GraftTopic.Config)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-topic(${cfg.topics.mkString(",")})"
  override def schema(): StructType = graft.streaming.KafkaWire.wireSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(cfg.topics.nonEmpty, "graft-topic source requires subscribe")
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = graft.streaming.KafkaWire.wireSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftTopicStream(cfg)
      }
    }
  }

  /** Producer side (reference streaming/producer.py:317-358): rows of
    * `KafkaWire.toWire`'s shape — `value` binary required, `key` binary
    * and `topic` string optional (the `topic` option is the fallback,
    * as in the Kafka sink). Scale shape: tasks STREAM their rows
    * directly into partition-exclusive segment files (no task-side
    * buffering, no row payloads in commit messages); the DRIVER's epoch
    * commit appends one manifest REFERENCE line per segment to each
    * partition log — bytes move task→storage, only paths/counts move
    * through the driver. Per-key ordering holds because the keyed
    * partitioner routes a key to one broker partition and the driver
    * serializes manifest appends in task order. Epoch retries re-commit
    * fresh segments — at-least-once, the real Kafka sink's semantics. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    def idx(n: String) = s.fieldNames.indexOf(n)
    val vi = idx("value")
    require(vi >= 0 && s(vi).dataType == BinaryType,
      "graft-topic sink requires a binary `value` column")
    val ki = idx("key")
    val ti = idx("topic")
    require(ti >= 0 || cfg.topics.nonEmpty,
      "graft-topic sink needs a `topic` column or a topic option")
    require(ti < 0 || s(ti).dataType == StringType, "`topic` must be string")
    val defaultTopic = cfg.topics.headOption.getOrElse("")
    new WriteBuilder {
      override def buildForStreaming(): StreamingWrite =
        new GraftTopicStreamingWrite(cfg, defaultTopic, ki, vi, ti)
    }
  }
}

/** One committed segment: rows for exactly one (topic, broker
  * partition), already durable at `relPath` under the topic dir.
  * The ONLY payload a task sends to the driver. */
private[sources] final case class GraftTopicSegments(
    segs: Seq[(String, Int, String, Long)]) // (topic, partition, relPath, count)
  extends WriterCommitMessage

private[sources] final case class GraftTopicWriterFactory(
    dir: String, partitions: Int, defaultTopic: String, ki: Int, vi: Int, ti: Int)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    // One open segment per (topic, broker partition), created lazily,
    // streamed to as rows arrive — task memory is O(open files), never
    // O(rows). Names carry epoch/task/uuid so retries never collide.
    private val open = scala.collection.mutable.LinkedHashMap
      .empty[(String, Int), (String, java.io.FileOutputStream, java.io.Writer, Array[Long])]
    private val enc = Base64.getEncoder
    override def write(r: InternalRow): Unit = {
      val topic =
        if (ti >= 0 && !r.isNullAt(ti)) r.getUTF8String(ti).toString else defaultTopic
      val key = if (ki >= 0 && !r.isNullAt(ki)) r.getBinary(ki) else null
      val p = GraftTopic.partitionFor(key, partitions)
      val (_, _, w, n) = open.getOrElseUpdate((topic, p), {
        val rel = s"segments/e$epochId-t$taskId-p$p-${UUID.randomUUID()}.seg"
        val path = Paths.get(dir, topic, rel)
        Files.createDirectories(path.getParent)
        val fos = new java.io.FileOutputStream(path.toFile)
        (rel, fos, new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(fos, java.nio.charset.StandardCharsets.UTF_8)), Array(0L))
      })
      w.write((if (key == null) "" else enc.encodeToString(key)) + "\t" +
        enc.encodeToString(r.getBinary(vi)) + "\t" + epochId + "\n")
      n(0) += 1
    }
    override def commit(): WriterCommitMessage = {
      // flush + fsync BEFORE the driver sees the path: without the sync a
      // host crash can persist the (later) manifest ref but not these
      // bytes, yielding a dangling reference. Readers additionally
      // tolerate missing/short segments as torn tail (defense in depth).
      open.values.foreach { case (_, fos, w, _) =>
        w.flush(); fos.getFD.sync(); w.close()
      }
      GraftTopicSegments(open.iterator.map { case ((t, p), (rel, _, _, n)) =>
        (t, p, rel, n(0))
      }.toSeq)
    }
    override def abort(): Unit = open.foreach { case ((t, _), (rel, _, w, _)) =>
      try w.close() catch { case _: Throwable => () }
      Files.deleteIfExists(Paths.get(dir, t, rel)) // never referenced
    }
    override def close(): Unit = ()
  }
}

private[sources] final class GraftTopicStreamingWrite(
    cfg: GraftTopic.Config, defaultTopic: String,
    ki: Int, vi: Int, ti: Int) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftTopicWriterFactory(cfg.dir, cfg.partitions, defaultTopic, ki, vi, ti)
  /** Refs the CURRENT epoch's commit has durably appended to a
    * manifest. If commit fails partway, Spark calls abort on the SAME
    * instance with all messages — deleting an already-referenced
    * segment there would poison the partition (recordCount counts
    * phantom records, readers hit FileNotFound forever). Abort may only
    * reclaim segments whose ref never landed. Epoch-scoped (epochs are
    * serial in a micro-batch stream): the set resets when a new epoch
    * starts committing, so driver memory stays bounded at one epoch's
    * segment count over an arbitrarily long stream. */
  private val referenced = scala.collection.mutable.Set.empty[(String, String)]
  private var trackedEpoch = Long.MinValue

  private def epochScope(epochId: Long): Unit =
    if (epochId != trackedEpoch) { referenced.clear(); trackedEpoch = epochId }

  /** Epoch commit = append one `@relPath\tcount` reference line per
    * segment to its partition manifest, in task order — the TxTable
    * idiom at log granularity: data durable first, visibility via a
    * tiny serialized commit record, no row bytes through the driver. */
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    epochScope(epochId)
    messages.foreach {
      case GraftTopicSegments(segs) => segs.foreach { case (topic, p, rel, n) =>
        GraftTopic.appendSegmentRef(cfg.dir, topic, p, rel, n)
        referenced += ((topic, rel))
      }
      case _ => ()
    }
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    epochScope(epochId)
    messages.foreach { // reclaim eagerly — but ONLY unreferenced segments
      case GraftTopicSegments(segs) => segs.foreach { case (topic, _, rel, _) =>
        if (!referenced((topic, rel)))
          Files.deleteIfExists(Paths.get(cfg.dir, topic, rel))
      }
      case _ => ()
    }
  }
}

/** Offsets: topic → partition → next line to read (i.e. count of lines
  * already consumed) — the Kafka offset JSON shape. */
private[sources] final case class GraftTopicOffset(
    offsets: Map[String, Map[Int, Long]]) extends Offset {
  override def json(): String = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    org.json4s.jackson.Serialization.write(
      offsets.map { case (t, ps) => t -> ps.map { case (p, o) => p.toString -> o } })
  }
}

private[sources] object GraftTopicOffset {
  def parse(json: String): GraftTopicOffset = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    GraftTopicOffset(org.json4s.jackson.Serialization
      .read[Map[String, Map[String, Long]]](json)
      .map { case (t, ps) => t -> ps.map { case (p, o) => p.toInt -> o } })
  }
}

private[sources] final class GraftTopicStream(cfg: GraftTopic.Config)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  /** Under Trigger.AvailableNow the end is frozen at query start and
    * admission control paces batches TOWARD it (without this, Spark
    * wraps the source and the wrapper ignores ReadLimit — the Kafka
    * source implements the same trait for the same reason). */
  @volatile private var frozenEnd: Option[Map[String, Map[Int, Long]]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    frozenEnd = Some(endOffsets().offsets)

  override def initialOffset(): Offset =
    // Only consulted on the FIRST start; afterwards the checkpoint's
    // offset log owns progress (deserializeOffset) — exactly the
    // startingOffsets-vs-committed-group split of the Kafka source.
    if (cfg.startingOffsets == "latest") endOffsets()
    else GraftTopicOffset(cfg.topics.map(t =>
      t -> (0 until cfg.partitions).map(_ -> 0L).toMap).toMap)

  override def deserializeOffset(json: String): Offset =
    GraftTopicOffset.parse(json)

  override def getDefaultReadLimit: ReadLimit =
    cfg.maxOffsetsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  /** Admission control: cap the batch at ReadMaxRows rows TOTAL,
    * prorated across partitions by availability (largest remainders
    * break ties deterministically in (topic, partition) order). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftTopicOffset].offsets
    val end = frozenEnd.getOrElse(endOffsets().offsets)
    val cap = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => return GraftTopicOffset(end)
    }
    val avail = for {
      t <- cfg.topics; p <- 0 until cfg.partitions
    } yield (t, p, math.max(0L,
      end.getOrElse(t, Map.empty).getOrElse(p, 0L) -
        from.getOrElse(t, Map.empty).getOrElse(p, 0L)))
    val total = avail.map(_._3).sum
    if (total <= cap) return GraftTopicOffset(end)
    val take = GraftTopic.prorate(avail, cap)
    GraftTopicOffset(cfg.topics.map { t =>
      t -> (0 until cfg.partitions).map { p =>
        p -> (from.getOrElse(t, Map.empty).getOrElse(p, 0L) + take((t, p)))
      }.toMap
    }.toMap)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftTopicOffset].offsets
    val e = end.asInstanceOf[GraftTopicOffset].offsets
    (for {
      t <- cfg.topics; p <- 0 until cfg.partitions
      lo = s.getOrElse(t, Map.empty).getOrElse(p, 0L)
      hi = e.getOrElse(t, Map.empty).getOrElse(p, 0L)
      if hi > lo
    } yield GraftTopicRange(GraftTopic.logFile(cfg.dir, t, p), t, p, lo, hi)
      : InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftTopicReaderFactory

  override def commit(end: Offset): Unit = () // retention is the broker's concern
  override def stop(): Unit = ()

  private def endOffsets(): GraftTopicOffset =
    GraftTopicOffset(cfg.topics.map(t =>
      t -> (0 until cfg.partitions)
        .map(p => p -> GraftTopic.recordCount(GraftTopic.logFile(cfg.dir, t, p)))
        .toMap).toMap)
}

private[sources] final case class GraftTopicRange(
    file: String, topic: String, partition: Int, from: Long, until: Long)
  extends InputPartition

private[sources] final class GraftTopicReaderFactory
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[GraftTopicRange]
    new PartitionReader[InternalRow] {
      private val topicDir = Paths.get(r.file).getParent
      private val manifest = new BufferedReader(new FileReader(r.file))
      private var seg: BufferedReader = _ // open segment, if inside one
      private var segLeft = 0L
      private var pos = 0L // offset of the NEXT record in the flattened log
      private var current: InternalRow = _

      private def emit(rec: (Array[Byte], Array[Byte], Long)): Boolean = {
        current = new GenericInternalRow(Array[Any](
          rec._1,
          rec._2,
          UTF8String.fromString(r.topic),
          r.partition,
          pos,
          rec._3,
          0)) // timestampType: CREATE_TIME, as the Kafka wire reports
        pos += 1
        true
      }

      /** Any malformed line — torn tail, a torn line merged with a later
        * append, a missing/short segment after a host crash — degrades to
        * "stop at what exists", NEVER an exception: a poisoned partition
        * must not kill the stream. [[GraftTopic.recordCount]] applies the
        * identical validation so offsets and scans agree. */
      override def next(): Boolean = {
        while (pos < r.until) {
          if (seg != null) {
            if (segLeft == 0) { seg.close(); seg = null }
            else {
              val raw = seg.readLine()
              if (raw == null) { seg.close(); seg = null; return false } // short segment (host crash): torn tail
              segLeft -= 1
              GraftTopic.parseInline(raw) match {
                case Some(rec) => if (pos >= r.from) return emit(rec) else pos += 1
                case None => seg.close(); seg = null; return false // garbled segment line
              }
            }
          } else {
            val raw = manifest.readLine()
            if (raw == null) return false // torn tail: stop at what exists
            if (raw.startsWith("@")) {
              GraftTopic.parseRef(raw) match {
                case None => return false // torn/garbled reference line
                case Some((rel, n)) =>
                  if (pos + n <= r.from) pos += n // skip whole segment unopened
                  else {
                    val f = topicDir.resolve(rel).toFile
                    if (!f.isFile) return false // dangling ref (host crash)
                    seg = new BufferedReader(new FileReader(f))
                    segLeft = n
                  }
              }
            } else GraftTopic.parseInline(raw) match {
              case Some(rec) => if (pos >= r.from) return emit(rec) else pos += 1
              case None => return false // torn inline line
            }
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = {
        if (seg != null) seg.close()
        manifest.close()
      }
    }
  }
}

/** Producer twin + broker-log helpers (reference streaming/producer.py:
  * 23-28, 317-358: JSON value serializer, keyed per-topic sends). */
object GraftTopic {

  final case class Config(dir: String, topics: Seq[String], partitions: Int,
                          startingOffsets: String, maxOffsetsPerTrigger: Option[Long])

  private[sources] def config(o: CaseInsensitiveStringMap): Config = {
    require(o.containsKey("brokerDir"), "graft-topic requires brokerDir")
    // Source path: `subscribe` (checked at scan build). Sink path: the
    // `topic` option as the default topic — same split as the Kafka
    // connector's subscribe vs topic options.
    val topics = Option(o.get("subscribe")).orElse(Option(o.get("topic")))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    Config(
      o.get("brokerDir"),
      topics,
      Option(o.get("partitions")).map(_.toInt).getOrElse(1),
      Option(o.get("startingOffsets")).getOrElse("earliest"),
      Option(o.get("maxOffsetsPerTrigger")).map(_.toLong))
  }

  private[sources] def logFile(dir: String, topic: String, partition: Int): String =
    s"$dir/$topic/p$partition.log"

  /** A well-formed `@relPath\tcount` reference line. Returns None for a
    * torn tail OR a torn line a later append concatenated onto
    * (`'@seg1\t' + '@seg2\t7\n'` → count field `'@seg2'`): both must
    * degrade to torn-tail handling, not NumberFormatException. */
  private[sources] def parseRef(raw: String): Option[(String, Long)] = {
    val f = raw.substring(1).split("\t")
    if (f.length < 2) None
    else
      try Some((f(0), f(1).toLong))
      catch { case _: NumberFormatException => None }
  }

  /** A well-formed inline record line `base64(key)\tbase64(value)\tts`.
    * None for torn/garbled lines (fewer than 3 fields, non-numeric ts,
    * undecodable base64) — shared by the reader and [[recordCount]] so a
    * torn line is invisible to BOTH, keeping offsets and scans in
    * agreement. */
  private[sources] def parseInline(raw: String): Option[(Array[Byte], Array[Byte], Long)] = {
    val f = raw.split("\t", -1)
    if (f.length < 3) None
    else
      try {
        val dec = Base64.getDecoder
        Some((
          if (f(0).isEmpty) null else dec.decode(f(0)),
          dec.decode(f(1)),
          f(2).toLong))
      } catch {
        case _: NumberFormatException | _: IllegalArgumentException => None
      }
  }

  /** Records visible in a partition manifest: well-formed inline lines
    * count 1, `@ref` lines with an EXISTING segment file their committed
    * count. Torn/garbled lines and dangling refs (host crash before the
    * segment fsync) stop the count — the reader applies the identical
    * validation and stops at the same point, so offsets and scans always
    * agree. */
  private[sources] def recordCount(file: String): Long = {
    val p = Paths.get(file)
    if (!Files.exists(p)) return 0L
    val topicDir = p.getParent
    val in = new BufferedReader(new FileReader(file))
    try {
      var n = 0L
      var raw = in.readLine()
      while (raw != null) {
        if (raw.startsWith("@")) parseRef(raw) match {
          case Some((rel, c)) if Files.isRegularFile(topicDir.resolve(rel)) => n += c
          case _ => return n // torn reference line or dangling ref
        } else if (parseInline(raw).isDefined) n += 1
        else return n // torn inline line
        raw = in.readLine()
      }
      n
    } finally in.close()
  }

  /** Kafka's default-partitioner shape: hash(key) mod partitions — one
    * key's records stay ORDERED within one partition, the property the
    * sessionizer downstream relies on. Shared by [[send]] and the
    * streaming sink's task writers so both producers agree. */
  private[sources] def partitionFor(key: Array[Byte], partitions: Int): Int =
    if (key == null) 0
    else math.floorMod(java.util.Arrays.hashCode(key), partitions)

  /** Driver-side epoch commit: make an already-durable segment visible
    * by appending its reference line to the partition manifest. */
  private[sources] def appendSegmentRef(dir: String, topic: String,
                                        partition: Int, relPath: String,
                                        count: Long): Unit = {
    val path = Paths.get(logFile(dir, topic, partition))
    Files.createDirectories(path.getParent)
    val w = new FileWriter(path.toFile, true)
    try w.write(s"@$relPath\t$count\n") finally w.close()
  }

  /** Largest-remainder proration of `cap` rows across partitions by
    * availability: quotas floor(a*cap/total) via BigInt (a*cap overflows
    * Long for large backlogs × large caps — a negative quotient would
    * under-admit to 0), then the rounding slack goes to the largest
    * remainders, (topic, partition) order breaking exact ties
    * deterministically. Callers guarantee total > cap. */
  private[sources] def prorate(avail: Seq[(String, Int, Long)], cap: Long)
      : Map[(String, Int), Long] = {
    val total = avail.map(_._3).sum
    val scaled = avail.map { case (t, p, a) =>
      val prod = BigInt(a) * cap
      (t, p, a, (prod / total).toLong, (prod % total).toLong)
    }
    var slack = cap - scaled.map(_._4).sum
    val extras = scala.collection.mutable.Set.empty[(String, Int)]
    scaled.sortBy { case (t, p, _, _, rem) => (-rem, t, p) }.foreach {
      case (t, p, a, q, _) =>
        if (slack > 0 && q < a) { extras += ((t, p)); slack -= 1 }
    }
    scaled.map { case (t, p, _, q, _) =>
      ((t, p), q + (if (extras((t, p))) 1L else 0L))
    }.toMap
  }

  /** Keyed send: the lightweight single-record producer (tests, the
    * generator). Single-writer per partition, like the reference's one
    * producer; records land inline in the partition manifest. */
  def send(dir: String, topic: String, partitions: Int,
           key: Array[Byte], value: Array[Byte], tsMicros: Long): Unit = {
    val p = partitionFor(key, partitions)
    val path = Paths.get(logFile(dir, topic, p))
    Files.createDirectories(path.getParent)
    val enc = Base64.getEncoder
    val line = (if (key == null) "" else enc.encodeToString(key)) + "\t" +
      enc.encodeToString(value) + "\t" + tsMicros + "\n"
    val w = new FileWriter(path.toFile, true)
    try w.write(line) finally w.close()
  }

  /** Send every row of a wire frame (key binary, value binary, topic
    * string — `KafkaWire.toWire`'s output) through the keyed producer.
    *
    * DRIVER-SIDE by design and BOUNDED by contract: this is the
    * micro-batch producer shim for specs and the event generator —
    * wire frames are one micro-batch, not a table. The guard makes the
    * contract a check instead of a comment; bulk paths write through
    * the DSv2 sink (graft-topic format), which streams per-partition
    * and never collects. */
  def sendWire(wire: org.apache.spark.sql.DataFrame, dir: String,
               partitions: Int, tsMicros: Long,
               maxRows: Int = 100000): Unit = {
    val rows = wire.select("key", "value", "topic").limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"sendWire is a micro-batch producer shim (> $maxRows rows collected); " +
        "bulk writes go through the graft-topic DSv2 sink")
    rows.foreach { r =>
      send(dir, r.getString(2), partitions,
        r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1), tsMicros)
    }
  }
}
