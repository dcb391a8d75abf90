package graft.mq

import org.apache.spark.sql.types._

import java.util.Locale

/** Parsed reader/writer options for the `graft-mq` source.
  *
  * Option surface (all case-insensitive, per DSv2 convention):
  *
  *  - `topic`              — topic name (default "default")
  *  - `backend`            — "broker" (in-memory broker logs), "generated"
  *                           (pure-function deterministic payloads; nothing
  *                           materialized — models an unbounded firehose),
  *                           or "socket" (the same broker surface over a
  *                           localhost TCP transport — [[MqSocketBroker]];
  *                           requires `brokerSocket`)
  *  - `brokerSocket`       — socket backend: the broker address
  *                           `host:port` (an [[MqSocketBroker.MqBrokerServer]])
  *  - `numPartitions`      — MQ partition count (default 4)
  *  - `rowsPerBatch`       — generated backend: rows appended per partition
  *                           per trigger (default 10)
  *  - `maxRowsPerBatch`    — admission control: cap on TOTAL rows per
  *                           micro-batch (→ ReadLimit.maxRows; the
  *                           `maxOffsetsPerTrigger` analogue from
  *                           /root/reference/README.md:399-422)
  *  - `minRowsPerBatch`    — admission control, min side (Kafka's
  *                           `minOffsetsPerTrigger` → ReadLimit.minRows):
  *                           defer the batch until this many rows are
  *                           available…
  *  - `maxTriggerDelayMs`  — …or this long has passed since the last
  *                           admitted batch (default 15 min, Kafka's
  *                           maxTriggerDelay)
  *  - `minPartitions`      — split offset ranges into at least this many
  *                           Spark tasks (README.md:431-433)
  *  - `seed`               — generated backend determinism seed (default 42)
  *  - `wordsPerMessage`    — generated backend payload length (default 4)
  *  - `failOnDataLoss`     — abort vs warn when requested offsets were
  *                           truncated (README.md:618-631)
  *  - `includeMetadata`    — emit the Kafka-grade 7-field schema instead of
  *                           the minimal `value: binary` (README.md:225-234)
  *  - `includeHeaders`     — add the `headers: array<struct<key,value>>`
  *                           column (README.md:233; implies the metadata
  *                           schema, mirroring Kafka's includeHeaders)
  *  - `startingOffsets`    — "earliest" (default), "latest", or Kafka-style
  *                           specific-offsets JSON `{"0":5,"1":-1}`
  *                           (-1 = latest, -2 = earliest per partition;
  *                           unlisted partitions start earliest)
  *  - `startingTimestampMicros` — start each partition at its first
  *                           message with timestamp ≥ this (epoch micros);
  *                           mutually exclusive with non-default
  *                           startingOffsets (README.md:372-397)
  *  - `endingOffsets`      — batch reads only: "latest" (default) or
  *                           specific-offsets JSON `{"0":9}` (-1 = latest
  *                           per partition) bounding the scan's upper end
  *  - `defaultTimestampMicros` — sink: timestamp stamped on written
  *                           messages when the written schema has no
  *                           `timestamp` column (epoch micros)
  *  - `columnarReader`     — vectorized scan (default true): fill on-heap
  *                           column vectors instead of per-row
  *                           InternalRows; schemas containing `headers`
  *                           fall back to the row reader automatically
  *  - `aggregatePushdown`  — batch reads: allow `count(*)`,
  *                           `min/max(offset)`, and their `GROUP BY
  *                           partition` forms to be answered from
  *                           resolved offset ranges without fetching a
  *                           single message (default true; disable for
  *                           A/B verification)
  *  - `pollTimeoutMs`      — broker backend: per-fetch latency bound
  *                           (default 120000, the Kafka consumer default
  *                           the reference documents at README.md:367-370);
  *                           a chunk fetch exceeding it throws
  *                           [[MqPollTimeoutException]] (README.md:654) —
  *                           a contended broker fails the task loudly
  *                           instead of hanging the trigger loop
  *  - `prefetch`           — transport backends: issue the next chunk's
  *                           fetch when the cursor crosses mid-buffer so
  *                           RPC latency overlaps compute (default true;
  *                           disable for A/B attribution — DrainProbe's
  *                           transport-tax interleave)
  *  - `prefetchDepth`      — consecutive chunks to keep in flight ahead
  *                           of the cursor (default 1, the r20 behavior;
  *                           max 8). Deeper helps when compute drains a
  *                           chunk faster than one RPC round-trips;
  *                           armed fetches only ever occupy the lower
  *                           half of the executor's fetch-thread cap, so
  *                           live fetches cannot be starved
  */
final case class GraftMqOptions(
    topic: String,
    backend: String,
    numPartitions: Int,
    rowsPerBatch: Long,
    maxRowsPerBatch: Option[Long],
    minPartitions: Option[Int],
    seed: Long,
    wordsPerMessage: Int,
    failOnDataLoss: Boolean,
    includeMetadata: Boolean,
    startingOffsets: String,
    defaultTimestampMicros: Long = 1700000000000000L,
    includeHeaders: Boolean = false,
    startingTimestampMicros: Option[Long] = None,
    endingOffsets: String = "latest",
    minRowsPerBatch: Option[Long] = None,
    maxTriggerDelayMs: Long = 15L * 60 * 1000,
    columnarReader: Boolean = true,
    pollTimeoutMs: Long = 120000L,
    aggregatePushdown: Boolean = true,
    brokerSocket: Option[String] = None,
    prefetch: Boolean = true,
    prefetchDepth: Int = 1) extends Serializable {
  def isGenerated: Boolean = backend == "generated"
  def isSocket: Boolean = backend == "socket"
  /** Pool/stats namespace for this source's consumers: socket sessions
    * must never be mixed with in-process ones for the same topic name.
    */
  def poolTopicKey: String =
    if (isSocket) s"${brokerSocket.get}/$topic" else topic
  def schema: StructType = {
    val base =
      if (includeMetadata || includeHeaders) GraftMqOptions.kafkaGradeSchema
      else GraftMqOptions.minimalSchema
    if (includeHeaders) base.add(StructField("headers", GraftMqOptions.headersType))
    else base
  }
}

object GraftMqOptions {
  /** The reference's intended minimal schema — `value: binary`
    * (/root/reference/src/main/java/org/example/CustomTableProvider.java:14-18,
    * fixing the discarded-StructType.add defect, SURVEY.md §2.9-1).
    */
  val minimalSchema: StructType = StructType(Seq(StructField("value", BinaryType)))

  /** Optional headers column type per /root/reference/README.md:233. */
  val headersType: ArrayType = ArrayType(StructType(Seq(
    StructField("key", StringType),
    StructField("value", BinaryType))))

  /** Kafka-grade schema per /root/reference/README.md:225-234. */
  val kafkaGradeSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  def from(options: java.util.Map[String, String]): GraftMqOptions = {
    def get(k: String): Option[String] = {
      val lower = k.toLowerCase(Locale.ROOT)
      val it = options.entrySet().iterator()
      var res: Option[String] = None
      while (it.hasNext && res.isEmpty) {
        val e = it.next()
        if (e.getKey.toLowerCase(Locale.ROOT) == lower) res = Some(e.getValue)
      }
      res
    }
    val backend = get("backend").map(_.toLowerCase(Locale.ROOT)).getOrElse("broker")
    require(backend == "broker" || backend == "generated" || backend == "socket",
      s"graft-mq: unknown backend '$backend' (expected broker|generated|socket)")
    val brokerSocket = get("brokerSocket").map(_.trim)
    require(backend != "socket" || brokerSocket.exists(_.contains(":")),
      "graft-mq: backend=socket requires brokerSocket=<host:port>")
    // "earliest" | "latest" | Kafka-style specific-offsets JSON
    // {"0":5,"1":-1} with -1 = latest, -2 = earliest per partition
    // (README.md:372-397 resolution modes). JSON is kept verbatim.
    val startingRaw = get("startingOffsets").map(_.trim).getOrElse("earliest")
    val starting =
      if (startingRaw.startsWith("{")) startingRaw
      else startingRaw.toLowerCase(Locale.ROOT)
    require(starting.startsWith("{") || starting == "earliest" || starting == "latest",
      s"graft-mq: unknown startingOffsets '$starting' (expected earliest|latest|{json})")
    val startingTs = get("startingTimestampMicros").map(_.toLong)
    require(startingTs.isEmpty || starting == "earliest",
      "graft-mq: startingTimestampMicros cannot be combined with startingOffsets")
    // Batch-only upper bound: "latest" (default) or specific-offsets JSON
    // (-1 = latest per partition). Mirrors Kafka's endingOffsets.
    val endingRaw = get("endingOffsets").map(_.trim).getOrElse("latest")
    val ending =
      if (endingRaw.startsWith("{")) endingRaw
      else endingRaw.toLowerCase(Locale.ROOT)
    require(ending.startsWith("{") || ending == "latest",
      s"graft-mq: unknown endingOffsets '$ending' (expected latest|{json})")
    // Numeric sanity up front: numPartitions=0 divides by zero in the
    // writer's round-robin and reads nothing; a non-positive rowsPerBatch
    // would move the generated head BACKWARDS each trigger.
    val numPartitions = get("numPartitions").map(_.toInt).getOrElse(4)
    require(numPartitions > 0,
      s"graft-mq: numPartitions must be positive, got $numPartitions")
    val rowsPerBatch = get("rowsPerBatch").map(_.toLong).getOrElse(10L)
    require(rowsPerBatch > 0,
      s"graft-mq: rowsPerBatch must be positive, got $rowsPerBatch")
    val maxRows = get("maxRowsPerBatch").map(_.toLong)
    require(maxRows.forall(_ > 0),
      s"graft-mq: maxRowsPerBatch must be positive, got ${maxRows.get}")
    val minParts = get("minPartitions").map(_.toInt)
    require(minParts.forall(_ > 0),
      s"graft-mq: minPartitions must be positive, got ${minParts.get}")
    val pollTimeout = get("pollTimeoutMs").map(_.toLong).getOrElse(120000L)
    require(pollTimeout > 0,
      s"graft-mq: pollTimeoutMs must be positive, got $pollTimeout")
    // Bounded: each armed prefetch occupies a capped fetch-pool thread
    // while in flight; 8 chunks is far past any measured latency-hiding
    // benefit and keeps a single misconfigured source from monopolizing
    // the prefetch half of the thread budget.
    val prefetchDepth = get("prefetchDepth").map(_.toInt).getOrElse(1)
    require(prefetchDepth >= 1 && prefetchDepth <= 8,
      s"graft-mq: prefetchDepth must be in [1, 8], got $prefetchDepth")
    GraftMqOptions(
      topic = get("topic").getOrElse("default"),
      backend = backend,
      numPartitions = numPartitions,
      rowsPerBatch = rowsPerBatch,
      maxRowsPerBatch = maxRows,
      minPartitions = minParts,
      seed = get("seed").map(_.toLong).getOrElse(42L),
      wordsPerMessage = get("wordsPerMessage").map(_.toInt).getOrElse(4),
      failOnDataLoss = get("failOnDataLoss").map(_.toBoolean).getOrElse(true),
      includeMetadata = get("includeMetadata").map(_.toBoolean).getOrElse(false),
      startingOffsets = starting,
      defaultTimestampMicros =
        get("defaultTimestampMicros").map(_.toLong).getOrElse(1700000000000000L),
      includeHeaders = get("includeHeaders").map(_.toBoolean).getOrElse(false),
      startingTimestampMicros = startingTs,
      endingOffsets = ending,
      minRowsPerBatch = get("minRowsPerBatch").map(_.toLong),
      maxTriggerDelayMs =
        get("maxTriggerDelayMs").map(_.toLong).getOrElse(15L * 60 * 1000),
      columnarReader = get("columnarReader").map(_.toBoolean).getOrElse(true),
      pollTimeoutMs = pollTimeout,
      aggregatePushdown = get("aggregatePushdown").map(_.toBoolean).getOrElse(true),
      brokerSocket = brokerSocket,
      prefetch = get("prefetch").map(_.toBoolean).getOrElse(true),
      prefetchDepth = prefetchDepth)
  }
}
