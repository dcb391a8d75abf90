package graft.mq

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** One Spark task = one MQ-partition offset range `[from, until)` —
  * the Kafka-grade planning unit (/root/reference/README.md:427-446),
  * replacing the mock's one-partition-per-executor fabrication
  * (CustomMicroBatchStream.java:44-54). Serializable: shipped
  * driver → executor (README.md:500-502).
  */
case class GraftMqInputPartition(
    topic: String,
    partition: Int,
    from: Long,
    until: Long,
    opts: GraftMqOptions) extends InputPartition

case class GraftMqPartitionReaderFactory(opts: GraftMqOptions,
    readSchema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftMqPartitionReader(partition.asInstanceOf[GraftMqInputPartition], readSchema)
}

/** Bounded executor-side reader over `[from, until)`.
  *
  * Fixes the reference mock's unbounded `next() == true`
  * (MockInputPartitionReader.java:19-21, SURVEY.md §2.9-3): iteration stops
  * exactly at the end offset — left-closed right-open, the invariant the
  * reference README states at README.md:727.
  */
class GraftMqPartitionReader(p: GraftMqInputPartition, readSchema: StructType)
    extends PartitionReader[InternalRow] with Logging {

  // Pruned projection: field codes resolved once; `get()` materializes only
  // the columns the engine asked for (SupportsPushDownRequiredColumns) —
  // a metadata-only query never touches payload bytes.
  private val fieldCodes: Array[Int] = readSchema.fieldNames.map {
    case "key" => 0
    case "value" => 1
    case "topic" => 2
    case "partition" => 3
    case "offset" => 4
    case "timestamp" => 5
    case "timestampType" => 6
    case "headers" => 7
    case other => throw new IllegalArgumentException(s"graft-mq: unknown column '$other'")
  }
  private val topicUtf8 = UTF8String.fromString(p.topic)

  // Nested schema pruning (spark.sql.optimizer.nestedSchemaPruning) may
  // narrow the headers element struct to a subset of (key, value); rows
  // must match the schema readSchema() reports, so header structs are
  // built field-by-field from the REQUESTED element type — emitting a
  // fixed 2-field struct under a pruned schema would shift ordinals and
  // read keys as values.
  private val headerFieldCodes: Array[Int] =
    readSchema.fields.find(_.name == "headers").map { f =>
      f.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType.asInstanceOf[StructType].fieldNames.map {
          case "key" => 0
          case "value" => 1
          case other =>
            throw new IllegalArgumentException(s"graft-mq: unknown header field '$other'")
        }
    }.getOrElse(Array.empty)

  private var offset = p.from
  private var current: MqMessage = _
  // Broker reads are chunked so a huge range doesn't materialize at once.
  private val ChunkSize = 4096
  private var chunk: IndexedSeq[MqMessage] = IndexedSeq.empty
  private var chunkStart = p.from

  override def next(): Boolean = {
    if (offset >= p.until) return false
    current =
      if (p.opts.isGenerated) GeneratedPayloads.messageAt(p.opts, p.partition, offset)
      else brokerMessageAt(offset)
    if (current == null) false else { offset += 1; true }
  }

  private def brokerMessageAt(o: Long): MqMessage = {
    if (o >= chunkStart + chunk.size || o < chunkStart) {
      val topic = InMemoryMqBroker.get(p.topic).getOrElse {
        throw new IllegalStateException(s"graft-mq: topic '${p.topic}' not found on executor")
      }
      chunkStart = o
      chunk =
        try topic.read(p.partition, o, math.min(p.until, o + ChunkSize))
        catch {
          case e: MqOffsetOutOfRangeException if !p.opts.failOnDataLoss =>
            // failOnDataLoss=false: skip the lost range, resume at earliest
            // retained (README.md:642-645 semantics).
            logWarning(s"graft-mq: data loss on ${p.topic}-${p.partition}: ${e.getMessage}; skipping")
            val earliest = topic.earliestOffsets(p.partition)
            chunkStart = math.max(o, earliest)
            if (chunkStart >= p.until) IndexedSeq.empty
            else topic.read(p.partition, chunkStart, math.min(p.until, chunkStart + ChunkSize))
        }
      offset = chunkStart
      if (chunk.isEmpty) return null
    }
    chunk((offset - chunkStart).toInt)
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](fieldCodes.length)
    var i = 0
    while (i < fieldCodes.length) {
      vals(i) = fieldCodes(i) match {
        case 0 => current.key
        case 1 => current.value
        case 2 => topicUtf8
        case 3 => p.partition
        case 4 => offset - 1
        case 5 => current.timestamp
        case 6 => 0 // timestampType: 0 = create-time, mirroring Kafka's enum
        case 7 =>
          if (current.headers == null) null
          else new org.apache.spark.sql.catalyst.util.GenericArrayData(
            current.headers.map { case (k, v) =>
              val cells: Array[Any] = headerFieldCodes.map {
                case 0 => UTF8String.fromString(k)
                case 1 => v
              }
              new GenericInternalRow(cells)
            })
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = ()
}

/** Pure-function payload generator: message at (seed, partition, offset) is
  * deterministic, so the "generated" backend is an unbounded firehose that
  * needs no storage and replays identically on checkpoint recovery — the
  * property the reference mock lacks (it stamps wall-clock payloads,
  * MockInputPartitionReader.java:25; SURVEY.md §7 risk 3).
  */
object GeneratedPayloads {
  val Vocab: IndexedSeq[String] = IndexedSeq(
    "spark", "stream", "batch", "query", "shuffle", "merge", "window", "offset")

  /** Event-time scheme of the generated backend: every message at
    * `offset` is stamped Base + offset·Step (micros). ONE definition —
    * [[GraftMqStart.offsetForTimestamp]] inverts this arithmetic for
    * timestamp seeks, so the two sides must share the constants.
    */
  val BaseTimestampMicros: Long = 1700000000000000L
  val StepMicros: Long = 1000000L

  /** splitmix64 — public-domain mixing function (Steele et al., JDK 8
    * SplittableRandom); full-avalanche, so consecutive offsets give
    * uncorrelated draws.
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def messageAt(opts: GraftMqOptions, partition: Int, offset: Long): MqMessage = {
    val base = mix64(opts.seed ^ (partition.toLong << 40) ^ offset)
    val words = (0 until opts.wordsPerMessage).map { i =>
      Vocab((math.abs(mix64(base + i)) % Vocab.size).toInt)
    }
    val payload = words.mkString(" ").getBytes("UTF-8")
    val key = s"$partition-$offset".getBytes("UTF-8")
    // Deterministic event time: fixed epoch + 1s per offset (micros).
    val ts = BaseTimestampMicros + offset * StepMicros
    val headers: Array[(String, Array[Byte])] =
      Array("source" -> "generated".getBytes("UTF-8"))
    MqMessage(key, payload, ts, headers)
  }
}
