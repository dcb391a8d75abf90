package graft.mq

import graft.SparkSuite
import org.apache.spark.sql.streaming.Trigger

/** The connector's Kafka-grade semantics ACROSS A REAL TRANSPORT
  * BOUNDARY (r19 — VERDICT r18 #5): every scenario here re-runs an
  * existing in-memory contract over [[MqSocketBroker]]'s localhost TCP
  * server — pooled-buffer reuse, poison invalidation, hung-fetch
  * timeout with pool-thread release, data-loss resume, generation
  * staleness, and the streaming read/write loop. The server fronts the
  * same [[InMemoryMqBroker]] logs, so producing/truncating/injecting
  * latency happens exactly as in the in-memory specs while every FETCH
  * crosses a socket (blocking, interrupt-deaf reads — the regime the
  * fetch-pool cap and close-on-invalidate exist for).
  */
class MqSocketBackendSpec extends SparkSuite {

  private val base = 1700000000000000L

  private lazy val server = {
    val s = new MqSocketBroker.MqBrokerServer()
    // Daemon threads; closed with the JVM. One server for the suite.
    s
  }

  private def fill(topic: String, partitions: Int, n: Int): InMemoryMqBroker.TopicState = {
    InMemoryMqBroker.drop(topic)
    val state = InMemoryMqBroker.getOrCreate(topic, partitions)
    (0 until n).foreach { i =>
      state.append(i % partitions, MqMessage(null, s"m$i".getBytes("UTF-8"), base + i))
    }
    state
  }

  private def reader(topic: String, partitions: Int = 1) = spark.read
    .format("graft-mq")
    .option("backend", "socket").option("brokerSocket", server.address)
    .option("topic", topic).option("numPartitions", partitions.toString)

  test("batch read over the socket matches the in-memory log") {
    import spark.implicits._
    fill("sock-batch", 2, 10)
    val got = reader("sock-batch", 2).load()
      .select($"value".cast("string")).as[String].collect().toSet
    assert(got == (0 until 10).map(i => s"m$i").toSet)
  }

  test("sequential micro-batches over the socket reuse one connection and its buffer") {
    import spark.implicits._
    val topic = "sock-seq"
    fill(topic, 1, 300)
    val key = s"${server.address}/$topic"
    val st = MqConsumerPool.stats(key, 0)
    val (c0, f0, h0) = (st.created.get, st.brokerFetches.get, st.bufferHits.get)

    val q = spark.readStream.format("graft-mq")
      .option("backend", "socket").option("brokerSocket", server.address)
      .option("topic", topic).option("numPartitions", "1")
      .option("maxRowsPerBatch", "100").load()
      .select($"value".cast("string")).as[String]
      .writeStream.outputMode("append")
      .format("memory").queryName("sock_seq_out")
      .option("checkpointLocation", tmp("sock-seq-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      assert(spark.table("sock_seq_out").count() == 300)
    } finally q.stop()

    // Same contract as the in-memory pool spec: ONE connection dialed,
    // ONE broker fetch (the 4096-chunk over-fetch), 299 buffer hits —
    // the transport did not change the pooling semantics.
    assert(st.created.get - c0 == 1, s"created=${st.created.get - c0}")
    assert(st.brokerFetches.get - f0 == 1, s"fetches=${st.brokerFetches.get - f0}")
    assert(st.bufferHits.get - h0 == 299, s"hits=${st.bufferHits.get - h0}")
    assert(MqConsumerPool.idleCount(key, 0) == 1)
  }

  test("hung socket fetch: timeout at the bound, invalidate frees the stranded pool thread") {
    val topic = "sock-hung"
    val state = fill(topic, 1, 10)
    val key = s"${server.address}/$topic"
    val st = MqConsumerPool.stats(key, 0)
    val i0 = st.invalidated.get

    // The server-side read sleeps 60 s; the client's socket read ignores
    // Thread.interrupt — the EXACT leak regime of the fetch-pool cap.
    state.injectFetchDelay(0, 60000)
    val df = reader(topic).option("pollTimeoutMs", "300").load()
    val err = intercept[Exception] { df.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(_.isInstanceOf[MqPollTimeoutException]), err.toString)
    assert(st.invalidated.get - i0 >= 1)
    assert(MqConsumerPool.idleCount(key, 0) == 0)

    // invalidate closed the socket, which unblocks the interrupt-deaf
    // fetch thread NOW — not when the server's 60 s sleep expires. If
    // close-on-invalidate regressed, this poll times out (the thread
    // would stay stranded ~55 more seconds).
    val deadline = System.nanoTime() + 10000000000L
    while (MqConsumerPool.activeFetchThreads > 0 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(MqConsumerPool.activeFetchThreads == 0,
      "stranded socket fetch thread was not freed by invalidate's close")

    // Healthy again on a fresh connection.
    state.injectFetchDelay(0, 0)
    assert(df.collect().length == 10)
    assert(MqConsumerPool.idleCount(key, 0) == 1)
  }

  test("data-loss resume (failOnDataLoss=false) crosses the wire") {
    import spark.implicits._
    val topic = "sock-loss"
    val state = fill(topic, 1, 10)
    state.truncateTo(4)
    val got = reader(topic)
      .option("startingOffsets", """{"0":0}""")
      .option("failOnDataLoss", "false").load()
      .select($"value".cast("string")).as[String].collect().toSet
    assert(got == (4 until 10).map(i => s"m$i").toSet)
    // failOnDataLoss=true must abort with the out-of-range error, not a
    // generic transport failure: the exception type survives the socket.
    val err = intercept[Exception] {
      reader(topic).option("startingOffsets", """{"0":0}""")
        .option("failOnDataLoss", "true").load().collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(_.isInstanceOf[MqOffsetOutOfRangeException]), err.toString)
  }

  test("a recreated topic's pooled socket session is generation-stale on borrow") {
    import spark.implicits._
    val topic = "sock-stale"
    fill(topic, 1, 5)
    val key = s"${server.address}/$topic"
    def readAll(): Set[String] = reader(topic).load()
      .select($"value".cast("string")).as[String].collect().toSet
    val st = MqConsumerPool.stats(key, 0)
    val (c0, s0) = (st.created.get, st.staleDiscards.get)

    assert(readAll() == (0 until 5).map(i => s"m$i").toSet)
    assert(MqConsumerPool.idleCount(key, 0) == 1)

    // Drop + recreate on the broker: the pooled consumer's connection is
    // fine, but its buffers belong to a dead topic GENERATION — the
    // borrow-time META check must discard it, never serve it.
    InMemoryMqBroker.drop(topic)
    val st2 = InMemoryMqBroker.getOrCreate(topic, 1)
    (0 until 5).foreach(i =>
      st2.append(0, MqMessage(null, s"n$i".getBytes("UTF-8"), base + i)))
    assert(readAll() == (0 until 5).map(i => s"n$i").toSet)
    assert(st.staleDiscards.get - s0 >= 1)
    assert(st.created.get - c0 >= 2)
  }

  test("keys, headers, and timestamp seeks round-trip the wire codec") {
    import org.apache.spark.sql.functions._
    val topic = "sock-codec"
    InMemoryMqBroker.drop(topic)
    val state = InMemoryMqBroker.getOrCreate(topic, 1)
    (0 until 6).foreach { i =>
      val headers =
        if (i % 2 == 0) Array("h1" -> s"v$i".getBytes("UTF-8"),
          "h2" -> Array[Byte](0, 1, 2))
        else null
      state.append(0, MqMessage(
        if (i == 3) null else s"k$i".getBytes("UTF-8"),
        s"m$i".getBytes("UTF-8"), base + i * 1000000L, headers))
    }
    val rows = reader(topic)
      .option("includeHeaders", "true").load()
      .select(col("key").cast("string"), col("value").cast("string"),
        col("offset"), col("timestamp").cast("long"),
        expr("transform(headers, h -> struct(h.key, cast(h.value as string)))")
          .as("hs"))
      .collect().sortBy(_.getLong(2))
    assert(rows.length == 6)
    assert(rows(3).isNullAt(0), "null key must survive the wire")
    assert(rows(1).getString(0) == "k1")
    assert(rows.map(_.getString(1)).toSeq == (0 until 6).map(i => s"m$i"))
    assert(rows(1).isNullAt(4), "absent headers must stay null, not become empty")
    val h0 = rows(0).getSeq[org.apache.spark.sql.Row](4)
    assert(h0.map(r => r.getString(0) -> r.getString(1)) ==
      Seq("h1" -> "v0", "h2" -> new String(Array[Byte](0, 1, 2), "UTF-8")))
    // Timestamp seek (wire op TS_SEEK): start at the 4th message's event
    // time — the planner resolves first-start offsets over the socket.
    val seeked = reader(topic)
      .option("startingTimestampMicros", (base + 3000000L).toString).load()
      .select(col("value").cast("string")).collect().map(_.getString(0)).toSet
    assert(seeked == Set("m3", "m4", "m5"))
  }

  test("socket writer batches appends: >BufferRows rows land exactly once via APPEND_N") {
    import spark.implicits._
    val topic = "sock-write-batch"
    InMemoryMqBroker.drop(topic)
    InMemoryMqBroker.getOrCreate(topic, 1)
    // 1300 rows through one task: two full 512-row batches + a 276-row
    // commit-time flush — the per-batch RPC path and the tail flush.
    (0 until 1300).map(i => s"r$i").toDF("value")
      .coalesce(1)
      .select($"value".cast("binary").as("value"))
      .write.format("graft-mq")
      .option("backend", "socket").option("brokerSocket", server.address)
      .option("topic", topic).option("numPartitions", "1")
      .mode("append").save()
    val got = reader(topic).load()
      .select($"value".cast("string")).as[String].collect()
    assert(got.length == 1300)
    assert(got.toSet == (0 until 1300).map(i => s"r$i").toSet)
  }

  test("streaming write + read loop over the socket") {
    import spark.implicits._
    val topic = "sock-write"
    InMemoryMqBroker.drop(topic)
    InMemoryMqBroker.getOrCreate(topic, 2)
    // Batch write through the socket writer path.
    Seq("a", "b", "c", "d").toDF("value")
      .select($"value".cast("binary").as("value"))
      .write.format("graft-mq")
      .option("backend", "socket").option("brokerSocket", server.address)
      .option("topic", topic).option("numPartitions", "2")
      .mode("append").save()
    val got = reader(topic, 2).load()
      .select($"value".cast("string")).as[String].collect().toSet
    assert(got == Set("a", "b", "c", "d"))
  }
}
