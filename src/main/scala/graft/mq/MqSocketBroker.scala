package graft.mq

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetAddress, InetSocketAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.internal.Logging

/** Localhost TCP transport for the broker surface (r19 — VERDICT r18 #5:
  * the pool, poll-timeout, and data-loss semantics were production-shaped
  * but had never crossed a transport boundary). The server fronts
  * [[InMemoryMqBroker]] — same logs, same injected-latency hooks — so
  * every existing test scenario (buffer reuse, poison invalidation,
  * hung fetch, retention truncation) can run unchanged EXCEPT that
  * fetches now traverse a real socket: blocking reads that ignore
  * `Thread.interrupt` (the regime [[MqConsumerPool.FetchPoolMaxThreads]]
  * caps), connection death, and topic-generation staleness.
  *
  * Wire protocol: length-free framed DataStream ops, one request/response
  * at a time per connection (the client serializes calls per session —
  * one connection per pooled consumer, Kafka's consumer-per-connection
  * shape, so fetch concurrency comes from the POOL, not multiplexing).
  *
  *   op 1 CREATE   topic, numPartitions   -> numPartitions, generation
  *   op 2 META     topic                  -> numPartitions, generation
  *   op 3 READ     topic, p, from, until  -> count, messages
  *   op 4 ENDS     topic                  -> n, (partition, offset)*
  *   op 5 EARLIEST topic                  -> n, (partition, offset)*
  *   op 6 TS_SEEK  topic, p, ts           -> offset
  *   op 7 APPEND   topic, p, message      -> offset
  *   op 8 APPEND_N topic, p, n, messages  -> last offset (writer batching)
  *
  * Status codes: 0 OK; 1 offset-out-of-range (re-thrown client-side as
  * [[MqOffsetOutOfRangeException]] so failOnDataLoss semantics are
  * transport-transparent); 2 generic server error; 3 unknown topic.
  *
  * Topic GENERATION: the server notices when a topic name resolves to a
  * different [[InMemoryMqBroker.TopicState]] identity than last seen
  * (drop + recreate) and bumps a counter. A pooled consumer records the
  * generation it connected under; [[MqSocketSession.transportAlive]]
  * compares it on borrow — the socket twin of the in-memory pool's
  * `state eq live` staleness check (a buffer fetched from a dead
  * generation must never be served).
  */
object MqSocketBroker {

  private val StatusOk = 0
  private val StatusOutOfRange = 1
  private val StatusError = 2
  private val StatusNoTopic = 3

  // ---------------------------------------------------------------- server

  private final case class GenEntry(state: InMemoryMqBroker.TopicState, gen: Long)

  /** Localhost server over [[InMemoryMqBroker]]. `port = 0` binds an
    * ephemeral port; `address` is what readers/writers pass as the
    * `brokerSocket` option. Daemon threads throughout — a forgotten
    * server must never block JVM exit.
    */
  final class MqBrokerServer(port0: Int = 0) extends Logging {
    private val server = new ServerSocket()
    server.bind(new InetSocketAddress(InetAddress.getLoopbackAddress, port0))
    private val open = ConcurrentHashMap.newKeySet[Socket]()
    @volatile private var closed = false
    private val gens = new ConcurrentHashMap[String, GenEntry]()

    def port: Int = server.getLocalPort
    def address: String = s"${InetAddress.getLoopbackAddress.getHostAddress}:$port"

    private def generationOf(topic: String, st: InMemoryMqBroker.TopicState): Long =
      gens.compute(topic, (_, prev) =>
        if (prev == null) GenEntry(st, 1L)
        else if (prev.state eq st) prev
        else GenEntry(st, prev.gen + 1)).gen

    private val acceptor = new Thread(() => {
      while (!closed) {
        try {
          val s = server.accept()
          s.setTcpNoDelay(true)
          open.add(s)
          val t = new Thread(() => serve(s), s"graft-mq-server-conn-${s.getPort}")
          t.setDaemon(true)
          t.start()
        } catch {
          case _: IOException => // server socket closed — exit the loop
        }
      }
    }, s"graft-mq-server-accept-$port")
    acceptor.setDaemon(true)
    acceptor.start()

    private def serve(s: Socket): Unit = {
      val in = new DataInputStream(new BufferedInputStream(s.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(s.getOutputStream))
      try {
        while (true) {
          val op = in.readByte()
          val topic = in.readUTF()
          def withTopic(f: InMemoryMqBroker.TopicState => Unit): Unit =
            InMemoryMqBroker.get(topic) match {
              case Some(st) => f(st)
              case None =>
                out.writeByte(StatusNoTopic)
                out.writeUTF(s"graft-mq: topic '$topic' not found on broker")
            }
          def writeOffsets(m: Map[Int, Long]): Unit = {
            out.writeByte(StatusOk)
            out.writeInt(m.size)
            m.toSeq.sortBy(_._1).foreach { case (p, o) =>
              out.writeInt(p); out.writeLong(o)
            }
          }
          try op match {
            case 1 => // CREATE
              val n = in.readInt()
              val st = InMemoryMqBroker.getOrCreate(topic, n)
              out.writeByte(StatusOk)
              out.writeInt(st.numPartitions)
              out.writeLong(generationOf(topic, st))
            case 2 => // META
              withTopic { st =>
                out.writeByte(StatusOk)
                out.writeInt(st.numPartitions)
                out.writeLong(generationOf(topic, st))
              }
            case 3 => // READ
              val p = in.readInt(); val from = in.readLong(); val until = in.readLong()
              withTopic { st =>
                val msgs = st.read(p, from, until) // may block (injected latency)
                out.writeByte(StatusOk)
                out.writeInt(msgs.size)
                msgs.foreach(writeMessage(out, _))
              }
            case 4 => withTopic(st => writeOffsets(st.endOffsets))
            case 5 => withTopic(st => writeOffsets(st.earliestOffsets))
            case 6 => // TS_SEEK
              val p = in.readInt(); val ts = in.readLong()
              withTopic { st =>
                out.writeByte(StatusOk); out.writeLong(st.offsetForTimestamp(p, ts))
              }
            case 7 => // APPEND
              val p = in.readInt(); val msg = readMessage(in)
              withTopic { st =>
                out.writeByte(StatusOk); out.writeLong(st.append(p, msg))
              }
            case 8 => // APPEND_N
              val p = in.readInt(); val n = in.readInt()
              val msgs = IndexedSeq.fill(n)(readMessage(in))
              withTopic { st =>
                var last = -1L
                msgs.foreach(m => last = st.append(p, m))
                out.writeByte(StatusOk); out.writeLong(last)
              }
            case other =>
              out.writeByte(StatusError)
              out.writeUTF(s"graft-mq: unknown op $other")
          } catch {
            case e: MqOffsetOutOfRangeException =>
              out.writeByte(StatusOutOfRange); out.writeUTF(e.getMessage)
            case e: Exception =>
              out.writeByte(StatusError)
              out.writeUTF(s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
          out.flush()
        }
      } catch {
        case _: EOFException | _: IOException => // client went away
      } finally {
        open.remove(s)
        try s.close() catch { case _: IOException => () }
      }
    }

    def close(): Unit = {
      closed = true
      try server.close() catch { case _: IOException => () }
      open.forEach(s => try s.close() catch { case _: IOException => () })
    }
  }

  // ------------------------------------------------------------- wire codec

  private def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit =
    if (b == null) out.writeInt(-1)
    else { out.writeInt(b.length); out.write(b) }

  private def readBytes(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    if (n < 0) null
    else { val b = new Array[Byte](n); in.readFully(b); b }
  }

  private def writeMessage(out: DataOutputStream, m: MqMessage): Unit = {
    writeBytes(out, m.key)
    writeBytes(out, m.value)
    out.writeLong(m.timestamp)
    if (m.headers == null) out.writeInt(-1)
    else {
      out.writeInt(m.headers.length)
      m.headers.foreach { case (k, v) => out.writeUTF(k); writeBytes(out, v) }
    }
  }

  private def readMessage(in: DataInputStream): MqMessage = {
    val key = readBytes(in)
    val value = readBytes(in)
    val ts = in.readLong()
    val nh = in.readInt()
    val headers =
      if (nh < 0) null
      else Array.fill(nh) { val k = in.readUTF(); (k, readBytes(in)) }
    MqMessage(key, value, ts, headers)
  }

  // ---------------------------------------------------------------- client

  /** One connection to `addr`, bound to `topic`. All RPCs are serialized
    * on the session (one in-flight request per connection); reads BLOCK
    * on the socket and do NOT honor interrupts — precisely the backend
    * class the fetch-pool cap and close-on-invalidate exist for.
    */
  final class MqSocketSession private[MqSocketBroker] (
      val addr: String, val topic: String,
      socket: Socket) extends MqBrokerSession {

    private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
    @volatile private var broken = false
    // Bound at connect/create time (META/CREATE response).
    @volatile private var np: Int = 0
    @volatile private[mq] var generation: Long = 0L

    override def numPartitions: Int = np

    private[MqSocketBroker] def transportAliveBasic: Boolean =
      !broken && !socket.isClosed

    private def rpc[A](send: => Unit)(recv: Int => A): A = synchronized {
      try {
        send
        out.flush()
        recv(in.readByte().toInt)
      } catch {
        case e: IOException =>
          broken = true
          throw new IllegalStateException(
            s"graft-mq: broker connection to $addr lost (${e.getMessage})", e)
      }
    }

    private def fail(status: Int): Nothing = {
      val msg = in.readUTF()
      if (status == StatusOutOfRange) throw new MqOffsetOutOfRangeException(msg)
      else throw new IllegalStateException(msg)
    }

    private def readOffsets(): Map[Int, Long] = {
      val n = in.readInt()
      (0 until n).map(_ => in.readInt() -> in.readLong()).toMap
    }

    private[MqSocketBroker] def metaOf(t: String): Option[(Int, Long)] =
      rpc { out.writeByte(2); out.writeUTF(t) } {
        case StatusOk => Some((in.readInt(), in.readLong()))
        case StatusNoTopic => in.readUTF(); None
        case s => fail(s)
      }

    /** META this session's own topic and record (numPartitions,
      * generation); false if the topic does not exist on the broker.
      */
    private[MqSocketBroker] def bind(): Boolean = metaOf(topic) match {
      case Some((n, g)) => np = n; generation = g; true
      case None => false
    }

    /** CREATE this session's topic (the getOrCreate the planner/writer
      * sites use) and record its metadata.
      */
    private[MqSocketBroker] def create(n: Int): Int = {
      val (got, g) = rpc { out.writeByte(1); out.writeUTF(topic); out.writeInt(n) } {
        case StatusOk => (in.readInt(), in.readLong())
        case s => fail(s)
      }
      np = got; generation = g
      got
    }

    override def read(partition: Int, from: Long, until: Long): IndexedSeq[MqMessage] =
      rpc {
        out.writeByte(3); out.writeUTF(topic)
        out.writeInt(partition); out.writeLong(from); out.writeLong(until)
      } {
        case StatusOk =>
          val n = in.readInt()
          IndexedSeq.fill(n)(readMessage(in))
        case s => fail(s)
      }

    override def endOffsets: Map[Int, Long] =
      rpc { out.writeByte(4); out.writeUTF(topic) } {
        case StatusOk => readOffsets()
        case s => fail(s)
      }

    override def earliestOffsets: Map[Int, Long] =
      rpc { out.writeByte(5); out.writeUTF(topic) } {
        case StatusOk => readOffsets()
        case s => fail(s)
      }

    override def offsetForTimestamp(partition: Int, ts: Long): Long =
      rpc {
        out.writeByte(6); out.writeUTF(topic)
        out.writeInt(partition); out.writeLong(ts)
      } {
        case StatusOk => in.readLong()
        case s => fail(s)
      }

    override def append(partition: Int, msg: MqMessage): Long =
      rpc {
        out.writeByte(7); out.writeUTF(topic)
        out.writeInt(partition); writeMessage(out, msg)
      } {
        case StatusOk => in.readLong()
        case s => fail(s)
      }

    /** One round trip for the whole batch — the writer's per-partition
      * buffers land here (per-row RPCs would serialize a 100 TB sink on
      * network latency).
      */
    override def appendAll(partition: Int, msgs: Seq[MqMessage]): Long =
      if (msgs.isEmpty) -1L
      else rpc {
        out.writeByte(8); out.writeUTF(topic)
        out.writeInt(partition); out.writeInt(msgs.size)
        msgs.foreach(writeMessage(out, _))
      } {
        case StatusOk => in.readLong()
        case s => fail(s)
      }

    override def close(): Unit = {
      broken = true
      try socket.close() catch { case _: IOException => () }
    }

    /** Alive = connection usable AND the topic generation this session's
      * buffers were fetched under is still the broker's current one.
      */
    override def transportAlive: Boolean =
      !broken && !socket.isClosed &&
        (try currentGeneration(addr, topic) == generation
         catch { case _: Exception => false })
  }

  /** Socket read bound for every RPC that is NOT already under a
    * `timedRead` future (planner metadata, writer appends, borrow-time
    * META): a broker that hangs mid-response fails the call here with
    * the session marked broken, instead of blocking a driver planning
    * thread or an interrupt-deaf write task forever. Consumer READ
    * connections get max(this, 2×pollTimeoutMs) so the pollTimeoutMs
    * future — the precise, per-fetch bound — always fires first.
    */
  val RpcTimeoutMs: Int = 120000

  private def dial(addr: String, soTimeoutMs: Int): Socket = {
    val Array(host, port) = addr.split(":", 2)
    val s = new Socket()
    s.setTcpNoDelay(true)
    s.setSoTimeout(soTimeoutMs)
    s.connect(new InetSocketAddress(host, port.toInt), 10000)
    s
  }

  /** A fresh consumer session for (addr, topic) — one connection per
    * pooled consumer. Throws (like the in-memory borrow) if the topic
    * does not exist on the broker.
    */
  def connect(addr: String, topic: String,
      soTimeoutMs: Int = RpcTimeoutMs): MqSocketSession = {
    val s = new MqSocketSession(addr, topic, dial(addr, soTimeoutMs))
    if (s.bind()) s
    else {
      s.close()
      throw new IllegalStateException(
        s"graft-mq: topic '$topic' not found on broker $addr")
    }
  }

  /** A private CREATE-backed session — one per writer task, so N write
    * tasks append over N connections instead of serializing their
    * APPEND_N batches (and the planner's admission polls) on the shared
    * control session's per-RPC lock. Caller closes it.
    */
  def connectOrCreate(addr: String, topic: String,
      numPartitions: Int): MqSocketSession = {
    val s = new MqSocketSession(addr, topic, dial(addr, RpcTimeoutMs))
    try {
      val n = s.create(numPartitions)
      require(n == numPartitions,
        s"graft-mq: topic '$topic' has $n partitions; requested $numPartitions")
    } catch { case t: Throwable => s.close(); throw t }
    s
  }

  // Control sessions (planner metadata), shared per
  // (addr, topic), created with CREATE (the getOrCreate the in-memory
  // planner sites use). Reconnected transparently when broken.
  private val controls = new ConcurrentHashMap[(String, String), MqSocketSession]()

  def control(addr: String, topic: String, numPartitions: Int): MqBrokerSession = {
    val key = (addr, topic)
    // Partition-count validation on EVERY resolution, cache hit included —
    // the in-memory getOrCreate's contract (a reader seeing fewer
    // partitions would silently never read the upper ones).
    def validated(s: MqSocketSession): MqSocketSession = {
      require(s.numPartitions == numPartitions,
        s"graft-mq: topic '$topic' has ${s.numPartitions} partitions; " +
          s"requested $numPartitions")
      s
    }
    val cached = controls.get(key)
    if (cached != null && cached.transportAliveBasic) validated(cached)
    else controls.synchronized {
      val again = controls.get(key)
      if (again != null && again.transportAliveBasic) validated(again)
      else {
        if (again != null) again.close()
        val s = new MqSocketSession(addr, topic, dial(addr, RpcTimeoutMs))
        try {
          val n = s.create(numPartitions)
          require(n == numPartitions,
            s"graft-mq: topic '$topic' has $n partitions; requested $numPartitions")
        } catch { case t: Throwable => s.close(); throw t }
        controls.put(key, s)
        s
      }
    }
  }

  // Metadata channel per addr for generation lookups (borrow-time
  // staleness checks must not ride a consumer's own possibly-hung
  // connection).
  private val metaChannels = new ConcurrentHashMap[String, MqSocketSession]()

  private def metaChannel(addr: String): MqSocketSession = {
    val cached = metaChannels.get(addr)
    if (cached != null && cached.transportAliveBasic) cached
    else metaChannels.synchronized {
      val again = metaChannels.get(addr)
      if (again != null && again.transportAliveBasic) again
      else {
        if (again != null) again.close()
        val s = new MqSocketSession(addr, "", dial(addr, RpcTimeoutMs))
        metaChannels.put(addr, s)
        s
      }
    }
  }

  /** Broker's current generation for (addr, topic); -1 if absent. */
  def currentGeneration(addr: String, topic: String): Long =
    metaChannel(addr).metaOf(topic).map(_._2).getOrElse(-1L)
}
