package graft.sources.v2

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.{InMemoryQueue, QueueMessage}

/** Kafka-API shim over the partitioned topic source — the thin
  * `format("graft-kafka")` alias that makes the engine's streaming entry
  * point drop-in against Kafka-spec jobs:
  *
  *   spark.readStream.format("graft-kafka")
  *     .option("subscribe", topic).option("partitions", "4")
  *     .option("startingOffsets", """{"t":{"0":5,"1":-2}}""").load()
  *
  * [[TopicDataSource]] is already Kafka-SHAPED (per-partition offset map,
  * one task per partition, per-key publish-order logs); this shim adds the
  * Kafka-SPEC surface on top of the same logs:
  *
  *  - the Kafka source SCHEMA: (key BINARY, value BINARY, topic,
  *    partition, offset, timestamp, timestampType) — a job written against
  *    the real connector selects `CAST(value AS STRING)` unchanged;
  *  - `startingOffsets` / `endingOffsets` JSON semantics: `"earliest"`,
  *    `"latest"`, or `{"<topic>":{"<p>":<off>}}` with Kafka's sentinels
  *    -2 = earliest and -1 = latest; partitions absent from the JSON take
  *    the surface's default (streaming start: latest; batch start:
  *    earliest; batch end: latest — the connector's own fallbacks).
  *    Streaming reads ignore `endingOffsets`, exactly like Kafka;
  *  - `maxOffsetsPerTrigger` as the admission-cap name (the topic
  *    source's `maxMessagesPerTrigger` under its Kafka-spec alias).
  *
  * The `timestamp` column is a DETERMINISTIC synthetic stamp (offset
  * milliseconds since epoch; the local registry stores no broker time)
  * with timestampType = 0 (CreateTime) — documented so nobody windows on
  * it expecting wall-clock. Local scope: same single-JVM caveat as the
  * topic source; a cluster swaps in the real Kafka connector with an
  * IDENTICAL query shape — that swap being a one-line format change is
  * the point of this shim.
  */
class KafkaShimDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaShim.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    def req(k: String): String = Option(properties.get(k)).getOrElse(
      throw new IllegalArgumentException(s"option '$k' is required"))
    // reads name the topic `subscribe`, writes name it `topic` — the
    // Kafka connector's own split; `schema` is the Kafka column set for
    // reads and the incoming frame's shape for writes
    val topic = Option(properties.get("subscribe"))
      .orElse(Option(properties.get("topic"))).getOrElse(
        throw new IllegalArgumentException(
          "option 'subscribe' (read) or 'topic' (write) is required"))
    new KafkaShimTable(topic, req("partitions").toInt, schema)
  }
}

object KafkaShim {
  /** The Kafka source's own column set, verbatim. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = false),
    StructField("value", BinaryType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("timestampType", IntegerType, nullable = false)))

  /** Parse a Kafka offsets JSON (`{"topic":{"0":23,"1":-1}}`) into
    * topic → partition → offset, sentinels passed through raw.
    */
  def parseOffsetsJson(s: String): Map[String, Map[Int, Long]] = {
    val block = """"([^"]+)"\s*:\s*\{([^}]*)\}""".r
    val pair = """"(\d+)"\s*:\s*(-?\d+)""".r
    block.findAllMatchIn(s).map { m =>
      m.group(1) -> pair.findAllMatchIn(m.group(2))
        .map(x => x.group(1).toInt -> x.group(2).toLong).toMap
    }.toMap
  }

  /** Per-partition positions → the Kafka offsets JSON shape (the
    * round-trip partner of [[parseOffsetsJson]]).
    */
  def offsetsJson(topic: String, offsets: Map[Int, Long]): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, n) => s""""$p":$n""" }
      .mkString(s"""{"$topic":{""", ",", "}}")

  /** Kafka's DEFAULT partitioner hash, bit-exact: the Apache Kafka
    * client's 32-bit MurmurHash2 of the key bytes (seed 0x9747b28c) —
    * so a key lands on the SAME partition this shim and a real Kafka
    * producer would put it on, and a mixed deployment (shim locally,
    * broker in prod) keys identically.
    */
  def murmur2(data: Array[Byte]): Int = {
    val m = 0x5bd1e995
    val r = 17
    val length = data.length
    var h = 0x9747b28c ^ length
    var i = 0
    while (i + 4 <= length) {
      var k = (data(i) & 0xff) + ((data(i + 1) & 0xff) << 8) +
        ((data(i + 2) & 0xff) << 16) + ((data(i + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 4
    }
    val tail = length & ~3
    (length % 4) match {
      case 3 =>
        h ^= (data(tail + 2) & 0xff) << 16
        h ^= (data(tail + 1) & 0xff) << 8
        h ^= data(tail) & 0xff
        h *= m
      case 2 =>
        h ^= (data(tail + 1) & 0xff) << 8
        h ^= data(tail) & 0xff
        h *= m
      case 1 =>
        h ^= data(tail) & 0xff
        h *= m
      case _ =>
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** key bytes → topic partition, exactly like the Kafka client:
    * murmur2 masked non-negative, mod nPartitions.
    */
  def partitionFor(key: Array[Byte], nPartitions: Int): Int =
    (murmur2(key) & 0x7fffffff) % nPartitions

  /** Resolve a `startingOffsets`/`endingOffsets` spec against the live
    * logs: `"earliest"`, `"latest"`, or per-partition JSON with -2/-1
    * sentinels; partitions absent from the JSON take `default`.
    * A concrete offset must lie within [0, latest] — Kafka fails the
    * batch on an out-of-range request rather than clamping silently.
    */
  private[v2] def resolveOffsets(spec: String, topic: String,
      nPartitions: Int, latest: Int => Long,
      default: String): TopicOffset = {
    def resolve(p: Int, v: Long): Long = v match {
      case -2L => 0L
      case -1L => latest(p)
      case off =>
        require(off >= 0 && off <= latest(p),
          s"offset $off out of range [0, ${latest(p)}] for " +
            s"$topic partition $p")
        off
    }
    spec.trim match {
      case "earliest" => TopicOffset.zero(nPartitions)
      case "latest" =>
        TopicOffset((0 until nPartitions).map(p => p -> latest(p)).toMap)
      case json =>
        val m = parseOffsetsJson(json).getOrElse(topic,
          throw new IllegalArgumentException(
            s"offsets JSON $json names no topic '$topic'"))
        val dflt = if (default == "latest") -1L else -2L
        TopicOffset((0 until nPartitions).map { p =>
          p -> resolve(p, m.getOrElse(p, dflt))
        }.toMap)
    }
  }
}

private[v2] class KafkaShimTable(topic: String, nPartitions: Int,
    tableSchema: StructType) extends Table
    with SupportsRead with SupportsWrite {
  require(nPartitions > 0, "partitions must be positive")
  override def name(): String = s"graft_kafka($topic[$nPartitions])"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KafkaShimScan(topic, nPartitions,
        Option(options.get("startingOffsets")),
        Option(options.get("endingOffsets")),
        Option(options.get("maxOffsetsPerTrigger")).map(_.toLong),
        Option(options.get("minPartitions")).map(_.toInt).getOrElse(0))
    }

  /** The Kafka SINK surface: rows with a `value` column (string or
    * binary) and an optional `key` route to `partitionFor(key)`'s log —
    * the client's default partitioner, bit-exact. Each row publishes in
    * DataWriter.write, so delivery is AT-LEAST-ONCE exactly like the
    * real Kafka sink (a retried task republishes; the connector offers
    * no transactional producer to Spark either). Per-key order follows
    * per-input-partition row order — also the connector's contract: a
    * caller wanting total per-key order repartitions by key first.
    * Null/absent key → partition 0 (a LOCAL stand-in for the client's
    * sticky round-robin, chosen deterministic so contracts can replay).
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val schema = info.schema()
    val ki = schema.fieldNames.indexOf("key")
    val vi = schema.fieldNames.indexOf("value")
    require(vi >= 0, "graft-kafka sink needs a 'value' column")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              pi: PhysicalWriteInfo): DataWriterFactory =
            new KafkaShimWriterFactory(topic, nPartitions, ki, vi, schema)
          override def commit(m: Array[WriterCommitMessage]): Unit = ()
          override def abort(m: Array[WriterCommitMessage]): Unit = ()
        }
        override def toStreaming: StreamingWrite = new StreamingWrite {
          override def createStreamingWriterFactory(
              pi: PhysicalWriteInfo): StreamingDataWriterFactory =
            new KafkaShimWriterFactory(topic, nPartitions, ki, vi, schema)
          override def commit(epochId: Long,
              m: Array[WriterCommitMessage]): Unit = ()
          override def abort(epochId: Long,
              m: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
  }
}

/** Per-task Kafka-sink writer (see [[KafkaShimTable.newWriteBuilder]]).
  * key/value accept string or binary columns — the two shapes Kafka
  * jobs actually write.
  */
private[v2] class KafkaShimWriterFactory(topic: String, nPartitions: Int,
    keyIdx: Int, valueIdx: Int, schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {
  private def bytesAt(row: InternalRow, i: Int): Array[Byte] =
    if (i < 0 || row.isNullAt(i)) Array.emptyByteArray
    else schema.fields(i).dataType match {
      case BinaryType => row.getBinary(i)
      case _ => row.getUTF8String(i).getBytes
    }
  private def writer(): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        val key = bytesAt(row, keyIdx)
        val value = bytesAt(row, valueIdx)
        val p = if (key.isEmpty) 0
          else KafkaShim.partitionFor(key, nPartitions)
        InMemoryQueue.queue(TopicDataSource.queueName(topic, p))
          .add(QueueMessage(new String(key, "UTF-8"),
            new String(value, "UTF-8")))
      }
      override def commit(): WriterCommitMessage =
        new WriterCommitMessage {}
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = writer()
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = writer()
}

private[v2] class KafkaShimScan(topic: String, nPartitions: Int,
    starting: Option[String], ending: Option[String],
    maxPerTrigger: Option[Long], minPartitions: Int) extends Scan {
  override def readSchema(): StructType = KafkaShim.schema
  override def description(): String =
    s"graft-kafka topic=$topic partitions=$nPartitions"
  private def latest(p: Int): Long =
    InMemoryQueue.size(TopicDataSource.queueName(topic, p)).toLong

  /** Kafka's `minPartitions` semantics: when the natural one-slice-per-
    * topic-partition plan yields fewer read tasks than requested, slices
    * split into contiguous offset sub-ranges until the task count
    * reaches the floor — read parallelism beyond partition count, the
    * hot-partition relief a 100 TB backfill actually needs (a 3-broker-
    * partition topic can still fan across 32 cores). Splits are
    * proportional to slice depth (each slice gets ⌈share⌉ chunks of its
    * record range), deterministic, and row-preserving: a sub-range
    * [f, m) ∪ [m, t) is exactly [f, t) on an append log.
    */
  private def splitToMin(slices: Seq[TopicSlice]): Seq[TopicSlice] =
    if (minPartitions <= slices.length || slices.isEmpty) slices
    else {
      val total = slices.map(s => s.end - s.start).sum.toDouble
      slices.flatMap { s =>
        val depth = s.end - s.start
        val share = if (total <= 0) 1
          else math.max(1, math.ceil(minPartitions * depth / total).toInt)
        val chunk = math.max(1L, (depth + share - 1) / share)
        (s.start until s.end by chunk).map { f =>
          TopicSlice(s.topic, s.partition, f, math.min(f + chunk, s.end))
        }
      }
    }

  /** The micro-batch stream IS the topic source's (same offset map, same
    * per-partition slices, same admission allocation) with the initial
    * position resolved from `startingOffsets` (default latest, the Kafka
    * streaming default), slices split to `minPartitions`, and rows
    * rendered in the Kafka schema.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    val start = KafkaShim.resolveOffsets(starting.getOrElse("latest"),
      topic, nPartitions, latest, "latest")
    new TopicMicroBatchStream(topic, nPartitions, maxPerTrigger) {
      override def initialOffset(): Offset = start
      override def planInputPartitions(startOff: Offset,
          endOff: Offset): Array[InputPartition] =
        splitToMin(super.planInputPartitions(startOff, endOff)
          .map(_.asInstanceOf[TopicSlice]).toSeq)
          .map(s => s: InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new KafkaShimReaderFactory
    }
  }

  /** Batch read over [startingOffsets (default earliest),
    * endingOffsets (default latest)] — one task per (possibly split)
    * partition slice.
    */
  override def toBatch: Batch = new Batch {
    private val s0 = KafkaShim.resolveOffsets(
      starting.getOrElse("earliest"), topic, nPartitions, latest,
      "earliest")
    private val e0 = KafkaShim.resolveOffsets(ending.getOrElse("latest"),
      topic, nPartitions, latest, "latest")
    override def planInputPartitions(): Array[InputPartition] =
      splitToMin((0 until nPartitions).flatMap { p =>
        val (from, to) = (s0.offsets(p), e0.offsets(p))
        if (to > from) Some(TopicSlice(topic, p, from, to)) else None
      }).map(s => s: InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new KafkaShimReaderFactory
  }
}

private[v2] class KafkaShimReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[TopicSlice]
    val msgs = InMemoryQueue.slice(
      TopicDataSource.queueName(slice.topic, slice.partition),
      slice.start, slice.end)
    new PartitionReader[InternalRow] {
      private val it = msgs.iterator
      private var pos = slice.start - 1
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val m = it.next()
          pos += 1
          cur = new GenericInternalRow(Array[Any](
            m.id.getBytes("UTF-8"), m.body.getBytes("UTF-8"),
            UTF8String.fromString(slice.topic), slice.partition, pos,
            pos * 1000L, // offset ms since epoch, in micros (see scaladoc)
            0))
          true
        } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
