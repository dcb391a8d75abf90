package graft.tools

import graft.mq.{GeneratedPayloads, GraftMqOptions, InMemoryMqBroker, MqSocketBroker}

/** Dev tool: the connector's FULL-LOOP figure over the socket backend
  * (r20 — VERDICT r19 #8: the drain figure measures source throughput
  * only). Two pipelines, both reading a pre-filled socket topic through
  * the real micro-batch trigger loop:
  *
  *   1. loop    — socket source → typed flatMap (split words) → graft-mq
  *                socket SINK (append): every row crosses the wire twice
  *                (chunked fetch in, APPEND_N batch out) — the
  *                source→transform→sink round trip;
  *   2. wordcount — the reference README's demo shape (socket source →
  *                flatMap → groupBy().count()) with each epoch's counts
  *                landed on the MQ sink via foreachBatch (the idiomatic
  *                complete-mode → append-sink bridge).
  *
  * Figures are INPUT rows/s (messages drained from the source), so they
  * are comparable to the drain probe's socket figure on the same run —
  * the delta is the transform+sink cost. Same synthetic payloads as the
  * drain (4 words/message).
  *
  * Usage: runMain graft.tools.PipeProbe [totalRows] (default 2M).
  * Env: SPARK_GRAFT_CPUS (default 32, matching Bench).
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val totalRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = 4
    val spark = graft.Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val server = new MqSocketBroker.MqBrokerServer()
    val genOpts = GraftMqOptions(topic = "pipe-in", backend = "generated",
      numPartitions = parts, rowsPerBatch = totalRows / parts,
      maxRowsPerBatch = None, minPartitions = None, seed = 42L,
      wordsPerMessage = 4, failOnDataLoss = true, includeMetadata = false,
      startingOffsets = "earliest")

    def fill(topic: String, n: Long): Unit = {
      InMemoryMqBroker.drop(topic)
      val st = InMemoryMqBroker.getOrCreate(topic, parts)
      var p = 0
      while (p < parts) {
        var o = 0L
        while (o < n / parts) {
          st.append(p, GeneratedPayloads.messageAt(genOpts, p, o)); o += 1
        }
        p += 1
      }
    }

    def source(topic: String) = spark.readStream.format("graft-mq")
      .option("backend", "socket").option("brokerSocket", server.address)
      .option("topic", topic).option("numPartitions", parts.toString)
      .option("maxRowsPerBatch", math.max(totalRows / 8, 1L).toString)
      .load()

    def timed(label: String, n: Long)(run: () => Unit): Unit = {
      val t0 = System.nanoTime()
      run()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[pipe] $label%-12s ${math.round(n / sec)}%9d rows/s in ($sec%5.2f s)")
    }

    // ------------------------------------------------------------ 1. loop
    // Warm (untimed, small) then timed at the full workload.
    Seq(("pipe-warm", 20000L, false), ("pipe-in", totalRows, true)).foreach {
      case (topic, n, emit) =>
        fill(topic, n)
        val outTopic = s"$topic-out"
        InMemoryMqBroker.drop(outTopic)
        InMemoryMqBroker.getOrCreate(outTopic, parts)
        def run(): Unit = {
          val q = source(topic)
            .select($"value".cast("string")).as[String]
            .flatMap(_.split(" "))
            .select($"value".cast("binary").as("value"))
            .writeStream
            .format("graft-mq")
            .option("backend", "socket").option("brokerSocket", server.address)
            .option("topic", outTopic).option("numPartitions", parts.toString)
            .option("checkpointLocation",
              java.nio.file.Files.createTempDirectory("pipe-ckpt").toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination(); q.stop()
        }
        if (emit) timed("loop", n)(run _) else run()
        val written = InMemoryMqBroker.get(outTopic).map(_.endOffsets.values.sum).getOrElse(0L)
        val expected = (n / parts) * parts * genOpts.wordsPerMessage
        require(written == expected, s"loop wrote $written of $expected words")
    }

    // ------------------------------------------------------- 2. wordcount
    Seq(("pipe-warm2", 20000L, false), ("pipe-wc", totalRows, true)).foreach {
      case (topic, n, emit) =>
        fill(topic, n)
        val outTopic = s"$topic-counts"
        InMemoryMqBroker.drop(outTopic)
        InMemoryMqBroker.getOrCreate(outTopic, parts)
        def run(): Unit = {
          val q = source(topic)
            .select($"value".cast("string")).as[String]
            .flatMap(_.split(" "))
            .groupBy("value").count()
            .selectExpr("cast(value as string) as key",
              "cast(cast(count as string) as binary) as value")
            .writeStream.outputMode("complete")
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              batch.write.format("graft-mq")
                .option("backend", "socket")
                .option("brokerSocket", server.address)
                .option("topic", outTopic)
                .option("numPartitions", parts.toString)
                .mode("append").save()
            }
            .option("checkpointLocation",
              java.nio.file.Files.createTempDirectory("pipe-wc-ckpt").toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination(); q.stop()
        }
        if (emit) timed("wordcount", n)(run _) else run()
        val written = InMemoryMqBroker.get(outTopic).map(_.endOffsets.values.sum).getOrElse(0L)
        require(written > 0, "wordcount wrote no counts")
    }

    server.close()
    spark.stop()
  }
}
