package graft.sources

import java.io.{BufferedReader, FileReader, FileWriter}
import java.nio.file.{Files, Paths}
import java.util.Base64

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
  * Broker model: `brokerDir/<topic>/p<k>.log`, one append-only log file
  * per partition; a record is one line `base64(key)\tbase64(value)\tts`
  * and its OFFSET is its line number — Kafka's (topic, partition,
  * offset) coordinates verbatim. Appends-only means a (start, end]
  * range is immutable and every micro-batch replayable, which is what
  * makes checkpoint recovery exact. `latestOffset` counts lines per
  * partition (a real broker indexes; at spec scale the scan is the
  * honest, obviously-correct choice).
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
    * as in the Kafka sink). Tasks BUFFER their rows into commit
    * messages; the DRIVER appends them to the per-partition logs at
    * epoch commit, preserving Kafka's per-key ordering (the keyed
    * partitioner is the broker's, and a single committer serializes the
    * appends a multi-task file write would tear). Epoch retries can
    * re-append — at-least-once, the real Kafka sink's semantics. */
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

private[sources] final case class GraftTopicRecords(
    rows: Seq[(String, Array[Byte], Array[Byte])]) extends WriterCommitMessage

private[sources] final case class GraftTopicWriterFactory(
    defaultTopic: String, ki: Int, vi: Int, ti: Int)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val buf = scala.collection.mutable.ArrayBuffer
      .empty[(String, Array[Byte], Array[Byte])]
    override def write(r: InternalRow): Unit = buf += ((
      if (ti >= 0 && !r.isNullAt(ti)) r.getUTF8String(ti).toString else defaultTopic,
      if (ki >= 0 && !r.isNullAt(ki)) r.getBinary(ki) else null,
      r.getBinary(vi)))
    override def commit(): WriterCommitMessage = GraftTopicRecords(buf.toSeq)
    override def abort(): Unit = buf.clear()
    override def close(): Unit = ()
  }
}

private[sources] final class GraftTopicStreamingWrite(
    cfg: GraftTopic.Config, defaultTopic: String,
    ki: Int, vi: Int, ti: Int) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftTopicWriterFactory(defaultTopic, ki, vi, ti) // standalone: ships to tasks
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftTopicRecords(rows) => rows.foreach { case (topic, key, value) =>
        GraftTopic.send(cfg.dir, topic, cfg.partitions, key, value,
          tsMicros = epochId) // deterministic stamp: the epoch, not wall clock
      }
      case _ => ()
    }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
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
    val scaled = avail.map { case (t, p, a) => (t, p, a, a * cap / total) }
    var slack = cap - scaled.map(_._4).sum
    val take = scaled.map { case (t, p, a, q) =>
      val extra = if (slack > 0 && q < a) { slack -= 1; 1L } else 0L
      ((t, p), q + extra)
    }.toMap
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
        .map(p => p -> GraftTopic.lineCount(GraftTopic.logFile(cfg.dir, t, p)))
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
      private val in = new BufferedReader(new FileReader(r.file))
      private var line = 0L
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (line < r.from && in.readLine() != null) line += 1
        if (line >= r.until) return false
        val raw = in.readLine()
        if (raw == null) return false // torn tail: stop at what exists
        val f = raw.split("\t", -1)
        val dec = Base64.getDecoder
        current = new GenericInternalRow(Array[Any](
          if (f(0).isEmpty) null else dec.decode(f(0)),
          dec.decode(f(1)),
          UTF8String.fromString(r.topic),
          r.partition,
          line,
          f(2).toLong,
          0)) // timestampType: CREATE_TIME, as the Kafka wire reports
        line += 1
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = in.close()
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

  private[sources] def lineCount(file: String): Long = {
    val p = Paths.get(file)
    if (!Files.exists(p)) return 0L
    val in = new BufferedReader(new FileReader(file))
    try { var n = 0L; while (in.readLine() != null) n += 1; n }
    finally in.close()
  }

  /** Keyed send: partition = hash(key) mod partitions (Kafka's default
    * partitioner shape — one key's records stay ORDERED within one
    * partition, the property the sessionizer downstream relies on).
    * Single-writer per partition, like the reference's one producer. */
  def send(dir: String, topic: String, partitions: Int,
           key: Array[Byte], value: Array[Byte], tsMicros: Long): Unit = {
    val p = if (key == null) 0
      else math.floorMod(java.util.Arrays.hashCode(key), partitions)
    val path = Paths.get(logFile(dir, topic, p))
    Files.createDirectories(path.getParent)
    val enc = Base64.getEncoder
    val line = (if (key == null) "" else enc.encodeToString(key)) + "\t" +
      enc.encodeToString(value) + "\t" + tsMicros + "\n"
    val w = new FileWriter(path.toFile, true)
    try w.write(line) finally w.close()
  }

  /** Send every row of a wire frame (key binary, value binary, topic
    * string — `KafkaWire.toWire`'s output) through the keyed producer. */
  def sendWire(wire: org.apache.spark.sql.DataFrame, dir: String,
               partitions: Int, tsMicros: Long): Unit =
    wire.select("key", "value", "topic").collect().foreach { r =>
      send(dir, r.getString(2), partitions,
        r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1), tsMicros)
    }
}
