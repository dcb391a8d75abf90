package graft.mq

import graft.SparkSuite
import org.apache.spark.sql.streaming.Trigger

/** Executor-side consumer pooling (the reference's
  * InternalKafkaConsumerPool, README.md:565-587): sequential micro-batch
  * tasks on a partition reuse ONE pooled consumer and its retained fetch
  * buffer (zero broker round trips after the first refill); stale
  * sessions are discarded on borrow; poisoned consumers never re-enter
  * the pool; concurrent readers get distinct consumers; idle retention
  * is bounded. Counters are per-(topic, partition), so these assertions
  * are immune to suites running in parallel.
  */
class MqConsumerPoolSpec extends SparkSuite {

  private val base = 1700000000000000L

  private def fill(topic: String, partitions: Int, n: Int): InMemoryMqBroker.TopicState = {
    InMemoryMqBroker.drop(topic)
    val state = InMemoryMqBroker.getOrCreate(topic, partitions)
    (0 until n).foreach { i =>
      state.append(i % partitions, MqMessage(null, s"m$i".getBytes("UTF-8"), base + i))
    }
    state
  }

  test("sequential micro-batches reuse one consumer and its retained buffer") {
    import spark.implicits._
    val topic = "pool-seq"
    fill(topic, 1, 300)
    val st = MqConsumerPool.stats(topic, 0)
    val (c0, f0, h0, b0) =
      (st.created.get, st.brokerFetches.get, st.bufferHits.get, st.borrowed.get)

    val q = spark.readStream.format("graft-mq")
      .option("topic", topic).option("numPartitions", "1")
      .option("maxRowsPerBatch", "100").load()
      .select($"value".cast("string")).as[String]
      .writeStream.outputMode("append")
      .format("memory").queryName("pool_seq_out")
      .option("checkpointLocation", tmp("pool-seq-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      assert(spark.table("pool_seq_out").count() == 300)
    } finally q.stop()

    // >= 3 tasks borrowed (one per micro-batch), but ONE consumer was
    // created and ONE broker fetch happened: the 300-message log fits the
    // first 4096-chunk refill, and every later batch resumed from the
    // retained buffer (299 of 300 messages were buffer hits).
    assert(st.borrowed.get - b0 >= 3, s"borrowed=${st.borrowed.get - b0}")
    assert(st.created.get - c0 == 1, s"created=${st.created.get - c0}")
    assert(st.brokerFetches.get - f0 == 1, s"fetches=${st.brokerFetches.get - f0}")
    assert(st.bufferHits.get - h0 == 299, s"hits=${st.bufferHits.get - h0}")
    assert(MqConsumerPool.idleCount(topic, 0) == 1)
  }

  test("a recreated topic's stale pooled session is discarded on borrow") {
    import spark.implicits._
    val topic = "pool-stale"
    fill(topic, 1, 5)
    def readAll(): Set[String] = spark.read.format("graft-mq")
      .option("topic", topic).option("numPartitions", "1").load()
      .select($"value".cast("string")).as[String].collect().toSet
    val st = MqConsumerPool.stats(topic, 0)
    val (c0, s0) = (st.created.get, st.staleDiscards.get)

    assert(readAll() == (0 until 5).map(i => s"m$i").toSet)
    assert(MqConsumerPool.idleCount(topic, 0) == 1)

    // Drop + recreate: the pooled consumer's session (and buffer) belong
    // to a dead topic generation — it must be discarded, not served.
    InMemoryMqBroker.drop(topic)
    val state = InMemoryMqBroker.getOrCreate(topic, 1)
    (0 until 5).foreach(i =>
      state.append(0, MqMessage(null, s"n$i".getBytes("UTF-8"), base + i)))
    assert(readAll() == (0 until 5).map(i => s"n$i").toSet)
    assert(st.staleDiscards.get - s0 == 1)
    assert(st.created.get - c0 == 2)
  }

  test("a consumer that timed out is invalidated, never re-pooled") {
    val topic = "pool-poison"
    val state = fill(topic, 1, 10)
    val st = MqConsumerPool.stats(topic, 0)
    val i0 = st.invalidated.get

    state.injectFetchDelay(0, 60000)
    val df = spark.read.format("graft-mq")
      .option("topic", topic).option("numPartitions", "1")
      .option("pollTimeoutMs", "300").load()
    // collect(), not count(): a bare count(*) is now answered from offset
    // arithmetic (aggregate pushdown) and would never touch a consumer —
    // this test is about FETCH failure, so it must fetch.
    val err = intercept[Exception] { df.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(_.isInstanceOf[MqPollTimeoutException]), err.toString)
    assert(st.invalidated.get - i0 >= 1)
    assert(MqConsumerPool.idleCount(topic, 0) == 0,
      "poisoned consumer must not re-enter the idle set")

    // Healthy again: the next read creates a fresh consumer and succeeds.
    state.injectFetchDelay(0, 0)
    assert(df.collect().length == 10)
    assert(MqConsumerPool.idleCount(topic, 0) == 1)
  }

  test("concurrent borrows on one key get distinct consumers; idle retention is capped") {
    val topic = "pool-concurrent"
    fill(topic, 1, 1)
    val st = MqConsumerPool.stats(topic, 0)
    val (c0, e0) = (st.created.get, st.evicted.get)

    val a = MqConsumerPool.borrow(topic, 0)
    val b = MqConsumerPool.borrow(topic, 0)
    val c = MqConsumerPool.borrow(topic, 0)
    assert((a ne b) && (b ne c) && (a ne c),
      "a consumer's buffer position is single-reader state — no sharing")
    assert(st.created.get - c0 == 3)

    MqConsumerPool.release(a)
    MqConsumerPool.release(b)
    MqConsumerPool.release(c)
    // MaxIdlePerKey = 2: the oldest idle consumer was evicted.
    assert(MqConsumerPool.idleCount(topic, 0) == 2)
    assert(st.evicted.get - e0 == 1)

    // Reuse both idle consumers before creating anew.
    val d = MqConsumerPool.borrow(topic, 0)
    val e = MqConsumerPool.borrow(topic, 0)
    assert(st.created.get - c0 == 3, "idle consumers must be reused")
    val f = MqConsumerPool.borrow(topic, 0)
    assert(st.created.get - c0 == 4, "empty pool creates")
    Seq(d, e, f).foreach(MqConsumerPool.release)
  }

  test("fetch pool is capped: interrupt-ignoring stuck fetches exhaust it loudly, then it recovers") {
    val topic = "pool-cap"
    val state = fill(topic, 1, 10)
    val cap = MqConsumerPool.FetchPoolMaxThreads
    // Every fetch strands its pool thread for 2.5 s REGARDLESS of the
    // pollTimeoutMs interrupt — the backend-ignores-interrupts model the
    // cap exists for (an unbounded pool would just keep leaking threads).
    state.injectStubbornFetchDelay(0, 2500)
    val callers = java.util.concurrent.Executors.newCachedThreadPool()
    try {
      val futs = (0 until cap).map { _ =>
        callers.submit(new java.util.concurrent.Callable[Throwable] {
          override def call(): Throwable = {
            val c = MqConsumerPool.borrow(topic, 0)
            try { c.refill(0, 16, pollTimeoutMs = 200); null }
            catch { case t: Throwable => MqConsumerPool.invalidate(c); t }
          }
        })
      }
      // Wait until the cap's worth of fetch threads are genuinely busy.
      val deadline = System.nanoTime() + 10000000000L
      while (MqConsumerPool.activeFetchThreads < cap && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(MqConsumerPool.activeFetchThreads == cap,
        s"expected $cap busy fetch threads, saw ${MqConsumerPool.activeFetchThreads}")
      // All cap fetches timed out at the bound (the stuck threads live on).
      futs.foreach(f => assert(f.get(15, java.util.concurrent.TimeUnit.SECONDS)
        .isInstanceOf[MqPollTimeoutException]))
      // The cap+1-th fetch is REJECTED loudly — no silent queueing behind
      // threads that may never free.
      val c = MqConsumerPool.borrow(topic, 0)
      val err = intercept[MqPollTimeoutException] { c.refill(0, 16, pollTimeoutMs = 200) }
      assert(err.getMessage.contains("fetch pool exhausted"), err.getMessage)
      MqConsumerPool.invalidate(c)
      // Stuck threads drain at their own 2.5 s deadline; the pool recovers.
      state.injectStubbornFetchDelay(0, 0)
      val recovered = System.nanoTime() + 15000000000L
      while (MqConsumerPool.activeFetchThreads > 0 && System.nanoTime() < recovered)
        Thread.sleep(50)
      val c2 = MqConsumerPool.borrow(topic, 0)
      try assert(c2.refill(0, 16, pollTimeoutMs = 5000) == 10)
      finally MqConsumerPool.release(c2)
    } finally callers.shutdownNow()
  }

  test("buffer continuation survives a data-loss skip (failOnDataLoss=false)") {
    import spark.implicits._
    val topic = "pool-loss"
    val state = fill(topic, 1, 10)
    state.truncateTo(4)
    val df = spark.read.format("graft-mq")
      .option("topic", topic).option("numPartitions", "1")
      .option("startingOffsets", """{"0":0}""")
      .option("failOnDataLoss", "false").load()
      .select($"value".cast("string")).as[String]
    assert(df.collect().toSet == (4 until 10).map(i => s"m$i").toSet)
    // The consumer that hit the truncated range was dropped; its
    // replacement (which served the resume fetch) is pooled.
    assert(MqConsumerPool.idleCount(topic, 0) == 1)
  }
}
