package graft.mq

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** End-to-end Structured Streaming tests for the graft-mq source/sink.
  *
  * Covers the reference's demo pipeline (streaming WordCount,
  * /root/reference/README.md:74-124) plus the semantics the README
  * specifies but the mock lacks: bounded batches, checkpoint recovery with
  * no loss/dup (README.md:699-712), admission control (README.md:399-422),
  * and failOnDataLoss (README.md:618-631).
  */
class GraftMqStreamSpec extends SparkSuite {

  test("streaming WordCount over broker topic (the reference demo)") {
    val topic = "wc-demo"
    InMemoryMqBroker.drop(topic)
    InMemoryMqBroker.produceStrings(topic, 2,
      Seq("spark stream", "spark batch", "stream stream"))

    import spark.implicits._
    val lines = spark.readStream.format("graft-mq")
      .option("topic", topic).option("numPartitions", "2").load()
      .select($"value".cast("string")).as[String]
    val counts = lines.flatMap(_.split(" ")).groupBy("value").count()

    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("wc_out")
      .option("checkpointLocation", tmp("wc-ckpt")).start()
    try {
      q.processAllAvailable()
      val got = spark.table("wc_out").as[(String, Long)].collect().toMap
      assert(got == Map("spark" -> 2L, "stream" -> 3L, "batch" -> 1L))

      // Second batch: only the delta is read (offsets advanced).
      InMemoryMqBroker.produceStrings(topic, 2, Seq("batch batch"))
      q.processAllAvailable()
      val got2 = spark.table("wc_out").as[(String, Long)].collect().toMap
      assert(got2 == Map("spark" -> 2L, "stream" -> 3L, "batch" -> 3L))
    } finally q.stop()
  }

  test("checkpoint recovery: restart resumes exactly after committed offsets") {
    val topic = "recover"
    InMemoryMqBroker.drop(topic)
    InMemoryMqBroker.produceStrings(topic, 2, (1 to 10).map(i => s"m$i"))
    val ckpt = tmp("rec-ckpt")

    import spark.implicits._
    // The memory sink refuses checkpoint recovery in Spark 4; foreachBatch
    // is the recovery-capable sink for this assertion.
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def startQuery() = spark.readStream.format("graft-mq")
      .option("topic", topic).option("numPartitions", "2").load()
      .select($"value".cast("string")).as[String]
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], _: Long) =>
        batch.collect().foreach(seen.add)
      }
      .option("checkpointLocation", ckpt).start()

    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    assert(seen.size == 10)

    // New data lands while the query is down.
    InMemoryMqBroker.produceStrings(topic, 2, (11 to 15).map(i => s"m$i"))

    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      // Restarted query reads ONLY the post-checkpoint delta: no loss, no dup.
      import scala.jdk.CollectionConverters._
      val all = seen.asScala.toSeq
      assert(all.size == 15, s"expected 15 total rows (no dup/loss), got: $all")
      assert(all.toSet == (1 to 15).map(i => s"m$i").toSet)
    } finally q2.stop()
  }

  test("admission control: maxRowsPerBatch caps each micro-batch") {
    val topic = "admission"
    InMemoryMqBroker.drop(topic)
    InMemoryMqBroker.produceStrings(topic, 4, (1 to 100).map(i => s"r$i"))

    import spark.implicits._
    val q = spark.readStream.format("graft-mq")
      .option("topic", topic).option("numPartitions", "4")
      .option("maxRowsPerBatch", "30").load()
      .select($"value".cast("string")).as[String]
      .writeStream.outputMode("append")
      .format("memory").queryName("adm_out")
      .option("checkpointLocation", tmp("adm-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      // All 100 rows arrive, but over >= 4 micro-batches of <= 30 rows
      // (+ rounding: sub-1 prorated shares round up, Kafka-style).
      assert(spark.table("adm_out").count() == 100)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.nonEmpty)
      assert(batches.forall(_.numInputRows <= 34),
        s"batch sizes: ${batches.map(_.numInputRows).mkString(",")}")
      assert(batches.length >= 3)
    } finally q.stop()
  }

  test("admission control, min side: minRowsPerBatch defers until enough rows or delay expiry") {
    val topic = "admission-min"
    InMemoryMqBroker.drop(topic)
    InMemoryMqBroker.produceStrings(topic, 2, (1 to 3).map(i => s"a$i"))

    import spark.implicits._
    def start(maxDelayMs: Long) = spark.readStream.format("graft-mq")
      .option("topic", topic).option("numPartitions", "2")
      .option("minRowsPerBatch", "10")
      .option("maxTriggerDelayMs", maxDelayMs.toString).load()
      .select($"value".cast("string")).as[String]
      .writeStream.outputMode("append")
      .format("memory").queryName("adm_min_out")
      .option("checkpointLocation", tmp("adm-min-ckpt"))
      .start()

    // Below the min with a long delay: nothing may be admitted.
    val q1 = start(maxDelayMs = 10 * 60 * 1000)
    try {
      q1.processAllAvailable()
      assert(spark.table("adm_min_out").isEmpty,
        "3 rows < minRowsPerBatch=10 must not form a batch")
      // Crossing the min releases the backlog (same query, same gate).
      InMemoryMqBroker.produceStrings(topic, 2, (4 to 12).map(i => s"a$i"))
      q1.processAllAvailable()
      assert(spark.table("adm_min_out").count() == 12)
    } finally q1.stop()

    // Trigger.AvailableNow must drain its frozen snapshot COMPLETELY even
    // when the tail is smaller than minRows (Kafka skips the
    // minOffsetsPerTrigger gate under allDataForTriggerAvailableNow) —
    // otherwise the run terminates with unprocessed data from its own
    // target.
    val topic3 = "admission-min-availnow"
    InMemoryMqBroker.drop(topic3)
    InMemoryMqBroker.produceStrings(topic3, 1, (1 to 25).map(i => s"v$i"))
    val q3 = spark.readStream.format("graft-mq")
      .option("topic", topic3).option("numPartitions", "1")
      .option("minRowsPerBatch", "10").option("maxRowsPerBatch", "10")
      .option("maxTriggerDelayMs", (10 * 60 * 1000).toString).load()
      .select($"value".cast("string")).as[String]
      .writeStream.outputMode("append")
      .format("memory").queryName("adm_min_an_out")
      .option("checkpointLocation", tmp("adm-min-an-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    try {
      q3.awaitTermination(60000)
      assert(spark.table("adm_min_an_out").count() == 25,
        "AvailableNow must process the full snapshot incl. the 5-row tail < minRows")
    } finally q3.stop()

    // Delay escape hatch: with an expired maxTriggerDelay, a sub-min
    // backlog flows anyway (Kafka's maxTriggerDelay semantics).
    val topic2 = "admission-min-delay"
    InMemoryMqBroker.drop(topic2)
    InMemoryMqBroker.produceStrings(topic2, 2, Seq("d1", "d2"))
    val q2 = spark.readStream.format("graft-mq")
      .option("topic", topic2).option("numPartitions", "2")
      .option("minRowsPerBatch", "1000")
      .option("maxTriggerDelayMs", "0").load()
      .select($"value".cast("string")).as[String]
      .writeStream.outputMode("append")
      .format("memory").queryName("adm_min_delay_out")
      .option("checkpointLocation", tmp("adm-min-delay-ckpt"))
      .start()
    try {
      q2.processAllAvailable()
      assert(spark.table("adm_min_delay_out").count() == 2)
    } finally q2.stop()
  }

  test("earliest start resolves to the earliest RETAINED offset on a truncated topic") {
    val topic = "trunc-earliest"
    InMemoryMqBroker.drop(topic)
    InMemoryMqBroker.produceStrings(topic, 1, (1 to 10).map(i => s"t$i"))
    InMemoryMqBroker.get(topic).get.truncateTo(4)

    import spark.implicits._
    // Streaming first start with default (earliest) offsets: must begin at
    // the retained head (offset 4), not 0 — not a data-loss abort.
    val q = spark.readStream.format("graft-mq")
      .option("topic", topic).option("numPartitions", "1")
      .option("failOnDataLoss", "true").load()
      .select($"value".cast("string")).as[String]
      .writeStream.outputMode("append")
      .format("memory").queryName("trunc_out")
      .option("checkpointLocation", tmp("trunc-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      assert(spark.table("trunc_out").as[String].collect().toSet ==
        (5 to 10).map(i => s"t$i").toSet)
    } finally q.stop()
  }

  test("generated backend is deterministic and unbounded") {
    import spark.implicits._
    // The generated firehose never drains under processAllAvailable (the
    // head advances every poll — that IS the unboundedness under test);
    // Trigger.AvailableNow freezes one batch's worth and terminates.
    def run(sinkName: String): Seq[String] = {
      val q = spark.readStream.format("graft-mq")
        .option("backend", "generated").option("numPartitions", "2")
        .option("rowsPerBatch", "5").option("seed", "7").load()
        .select($"value".cast("string")).as[String]
        .writeStream.outputMode("append")
        .format("memory").queryName(sinkName)
        .option("checkpointLocation", tmp("gen-ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      try {
        q.awaitTermination(60000) // batch 1: 2 partitions x 5 rows
        spark.table(sinkName).as[String].collect().toSeq.sorted
      } finally q.stop()
    }
    val a = run("gen_a")
    val b = run("gen_b")
    assert(a == b, "same seed must replay identical payloads")
    assert(a.size == 10)
    assert(a.forall(_.split(" ").forall(GeneratedPayloads.Vocab.contains)))
  }

  test("generated backend: restart resumes from restored offsets, no re-emission") {
    import spark.implicits._
    val ckpt = tmp("gen-rec-ckpt")
    def drainOnce(): Set[(Int, Long)] = {
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
      val q = spark.readStream.format("graft-mq")
        .option("backend", "generated").option("numPartitions", "2")
        .option("rowsPerBatch", "5").option("seed", "7")
        .option("includeMetadata", "true").load()
        .selectExpr("partition", "offset")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[(Int, Long)].collect().foreach(seen.add)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(60000) finally q.stop()
      import scala.jdk.CollectionConverters._
      seen.asScala.toSet
    }
    val first = drainOnce()
    assert(first == (for (p <- 0 until 2; o <- 0L until 5L) yield (p, o)).toSet)

    // Restart from the checkpoint: the generated head must resume from the
    // restored offsets (5 per partition), not zeros — re-emitting 0..4
    // would be duplicate output (ADVICE r01 high).
    val second = drainOnce()
    assert(second == (for (p <- 0 until 2; o <- 5L until 10L) yield (p, o)).toSet,
      s"restart re-emitted committed offsets: $second")
  }

  test("batch read + batch write round-trip (toBatch / BATCH_WRITE parity)") {
    val in = "batch-in"; val out = "batch-out"
    InMemoryMqBroker.drop(in); InMemoryMqBroker.drop(out)
    InMemoryMqBroker.produceStrings(in, 3, (1 to 20).map(i => s"b$i"))

    import spark.implicits._
    val df = spark.read.format("graft-mq")
      .option("topic", in).option("numPartitions", "3").load()
    assert(df.schema.fieldNames.toSeq == Seq("value"))
    assert(df.count() == 20)

    df.write.format("graft-mq").mode("append")
      .option("topic", out).option("numPartitions", "2").save()
    val roundTrip = spark.read.format("graft-mq")
      .option("topic", out).option("numPartitions", "2").load()
      .select($"value".cast("string")).as[String].collect().toSet
    assert(roundTrip == (1 to 20).map(i => s"b$i").toSet)
  }

  test("streaming write: readStream → transform → writeStream round-trip, no re-emission on restart") {
    val in = "swrite-in"; val out = "swrite-out"
    InMemoryMqBroker.drop(in); InMemoryMqBroker.drop(out)
    InMemoryMqBroker.produceStrings(in, 2, (1 to 10).map(i => s"s$i"))
    val ckpt = tmp("swrite-ckpt")

    import spark.implicits._
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-mq")
        .option("topic", in).option("numPartitions", "2").load()
        .select(upper($"value".cast("string")).cast("binary").as("value"))
        .writeStream.format("graft-mq")
        .option("topic", out).option("numPartitions", "2")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000); q.stop()
    }
    runOnce()
    def readOut(): Seq[String] = spark.read.format("graft-mq")
      .option("topic", out).option("numPartitions", "2").load()
      .select($"value".cast("string")).as[String].collect().toSeq
    assert(readOut().sorted == (1 to 10).map(i => s"S$i").sorted)

    // Restart from the same checkpoint with new input: only the new
    // messages are written — committed batches are not replayed.
    InMemoryMqBroker.produceStrings(in, 2, Seq("s11", "s12"))
    runOnce()
    assert(readOut().sorted == (1 to 12).map(i => s"S$i").sorted,
      "restart must append exactly the new messages")
  }

  test("startingOffsets: specific-offsets JSON with -1/-2 and timestamp start") {
    val topic = "start-modes"
    InMemoryMqBroker.drop(topic)
    val state = InMemoryMqBroker.getOrCreate(topic, 2)
    val base = 1700000000000000L
    // partition 0: m0..m9 at t=base+0..9s; partition 1: n0..n4
    (0 until 10).foreach(i =>
      state.append(0, MqMessage(null, s"m$i".getBytes("UTF-8"), base + i * 1000000L)))
    (0 until 5).foreach(i =>
      state.append(1, MqMessage(null, s"n$i".getBytes("UTF-8"), base + i * 1000000L)))

    import spark.implicits._
    def readWith(opts: (String, String)*): Set[String] = {
      val r = spark.read.format("graft-mq")
        .option("topic", topic).option("numPartitions", "2")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load().select($"value".cast("string")).as[String].collect().toSet
    }
    // {"0":7, "1":-1}: partition 0 from offset 7, partition 1 from latest
    assert(readWith("startingOffsets" -> """{"0":7,"1":-1}""") ==
      Set("m7", "m8", "m9"))
    // unlisted partition starts earliest; -2 is explicit earliest
    assert(readWith("startingOffsets" -> """{"0":-2}""").size == 15)
    // timestamp start: first message with ts >= base+8s per partition
    assert(readWith("startingTimestampMicros" -> (base + 8 * 1000000L).toString) ==
      Set("m8", "m9"))
    // mutual exclusivity is rejected
    val err = intercept[IllegalArgumentException] {
      readWith("startingOffsets" -> "latest",
        "startingTimestampMicros" -> base.toString)
    }
    assert(err.getMessage.contains("startingTimestampMicros"))
    // endingOffsets bounds the batch scan: [2, 4) on partition 0 only
    assert(readWith("startingOffsets" -> """{"0":2,"1":-1}""",
      "endingOffsets" -> """{"0":4,"1":0}""") == Set("m2", "m3"))
  }

  test("kafka-grade metadata schema (includeMetadata)") {
    val topic = "meta"
    InMemoryMqBroker.drop(topic)
    InMemoryMqBroker.produceStrings(topic, 2, Seq("x", "y", "z"), timestampMicros = 1000000L)
    val df = spark.read.format("graft-mq")
      .option("topic", topic).option("numPartitions", "2")
      .option("includeMetadata", "true").load()
    assert(df.schema.fieldNames.toSeq ==
      Seq("key", "value", "topic", "partition", "offset", "timestamp", "timestampType"))
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[String]("topic") == topic))
    assert(rows.map(r => (r.getAs[Int]("partition"), r.getAs[Long]("offset"))).distinct.length == 3)
  }

  test("includeHeaders: kafka-grade headers column (README.md:233)") {
    import spark.implicits._
    val df = spark.read.format("graft-mq")
      .option("backend", "generated").option("numPartitions", "1")
      .option("rowsPerBatch", "3").option("includeHeaders", "true").load()
    assert(df.schema.fieldNames.last == "headers")
    val rows = df.selectExpr("explode(headers) as h")
      .select($"h.key", $"h.value".cast("string")).as[(String, String)]
      .collect().toSet
    assert(rows == Set(("source", "generated")))
    // Broker messages without headers read as null.
    val topic = "no-headers"
    InMemoryMqBroker.drop(topic)
    InMemoryMqBroker.produceStrings(topic, 1, Seq("x"))
    val broker = spark.read.format("graft-mq")
      .option("topic", topic).option("numPartitions", "1")
      .option("includeHeaders", "true").load()
    assert(broker.select("headers").collect().head.isNullAt(0))
  }

  test("column pruning reaches the scan (SupportsPushDownRequiredColumns)") {
    val topic = "prune"
    InMemoryMqBroker.drop(topic)
    InMemoryMqBroker.produceStrings(topic, 2, Seq("p", "q", "r"))
    val df = spark.read.format("graft-mq")
      .option("topic", topic).option("numPartitions", "2")
      .option("includeMetadata", "true").load()
      .select("partition", "offset")
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.output.map(_.name) == Seq("partition", "offset"),
      s"scan must materialize only requested columns, got ${scan.output}")
    assert(df.collect().length == 3)
  }

  test("failOnDataLoss=true aborts on truncated offsets; false skips") {
    val topic = "loss"
    InMemoryMqBroker.drop(topic)
    InMemoryMqBroker.produceStrings(topic, 1, (1 to 10).map(i => s"l$i"))
    val state = InMemoryMqBroker.get(topic).get

    import spark.implicits._
    // Stream consumed up to offset 10, then retention truncates to 20 while
    // producer writes 10 more — restart must detect the gap. (foreachBatch:
    // the memory sink refuses checkpoint recovery in Spark 4.)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ckpt = tmp("loss-ckpt")
    def startQuery(failOnDataLoss: Boolean) = spark.readStream.format("graft-mq")
      .option("topic", topic).option("numPartitions", "1")
      .option("failOnDataLoss", failOnDataLoss.toString).load()
      .select($"value".cast("string")).as[String]
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], _: Long) =>
        batch.collect().foreach(seen.add)
      }
      .option("checkpointLocation", ckpt).start()

    val q1 = startQuery(failOnDataLoss = true)
    q1.processAllAvailable(); q1.stop()
    assert(seen.size == 10)

    InMemoryMqBroker.produceStrings(topic, 1, (11 to 30).map(i => s"l$i"))
    state.truncateTo(20)

    val q2 = startQuery(failOnDataLoss = true)
    val failed = intercept[Exception] { q2.processAllAvailable() }
    // Pin the FAILURE MODE, not just "some exception": the cause chain
    // must carry the offset-out-of-range diagnostic, or an unrelated
    // failure would count this contract as covered.
    val chain = Iterator.iterate(failed: Throwable)(_.getCause)
      .takeWhile(_ != null).map(e => s"${e.getClass.getName}: ${e.getMessage}")
      .mkString(" | ")
    assert(chain.contains("earliest retained"), chain)
    q2.stop()

    seen.clear()
    val q3 = startQuery(failOnDataLoss = false)
    try {
      q3.processAllAvailable()
      import scala.jdk.CollectionConverters._
      // Offsets 10..19 were lost to retention; 20..29 survive.
      assert(seen.asScala.toSet == (21 to 30).map(i => s"l$i").toSet)
    } finally q3.stop()
  }

  test("option validation: bad backend / startingOffsets / sink schema fail fast") {
    import spark.implicits._
    val badBackend = intercept[Exception] {
      spark.read.format("graft-mq").option("backend", "kafka").load()
    }
    assert(badBackend.getMessage.contains("backend"))
    val badStart = intercept[Exception] {
      spark.read.format("graft-mq").option("startingOffsets", "middle").load()
    }
    assert(badStart.getMessage.contains("startingOffsets"))
    // Sink requires a string/binary `value` column — the rejection must
    // name the column/type contract, not merely throw something. Spark's
    // DSv2 write-compat check fires first (CANNOT_SAFELY_CAST on `value`);
    // the sink's own require backs it for paths that bypass the analyzer.
    val badWrite = intercept[Exception] {
      Seq(1, 2).toDF("value").write.format("graft-mq").mode("append")
        .option("topic", "bad-sink").save()
    }
    val badWriteChain = Iterator.iterate(badWrite: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(badWriteChain.contains("`value`")
        || badWriteChain.contains("'value' must be string or binary"),
      badWriteChain)
  }

  test("streaming write sink: stream back into a topic") {
    val src = "sink-src"; val dst = "sink-dst"
    InMemoryMqBroker.drop(src); InMemoryMqBroker.drop(dst)
    InMemoryMqBroker.produceStrings(src, 2, Seq("a", "b", "c", "d"))

    import spark.implicits._
    val q = spark.readStream.format("graft-mq")
      .option("topic", src).option("numPartitions", "2").load()
      .select(upper($"value".cast("string")).as("value"))
      .writeStream.format("graft-mq")
      .option("topic", dst).option("numPartitions", "2")
      .option("checkpointLocation", tmp("sink-ckpt")).start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.format("graft-mq")
      .option("topic", dst).option("numPartitions", "2").load()
      .select($"value".cast("string")).as[String].collect().toSet
    assert(got == Set("A", "B", "C", "D"))
  }
}
