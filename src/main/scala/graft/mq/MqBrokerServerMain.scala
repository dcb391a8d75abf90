package graft.mq

/** Entry point for the OUT-OF-PROCESS broker fixture (r20 — VERDICT r19
  * #2: the r19 socket suite ran real sockets against same-JVM broker
  * state, which could hide serialization gaps — a shared object reference
  * smuggled past the codec would still "work"; a process boundary can't
  * be fooled). Starts an [[MqSocketBroker.MqBrokerServer]] on an
  * ephemeral port (or `args(0)`), prints one `GRAFT_MQ_PORT=<port>` line
  * for the parent to parse, and parks until killed. All broker state
  * lives in THIS process — the test drives it exclusively over the wire
  * (CREATE/APPEND_N for data, the admin ops for drop/truncate/injected
  * latency).
  */
object MqBrokerServerMain {
  def main(args: Array[String]): Unit = {
    val server = new MqSocketBroker.MqBrokerServer(args.headOption.map(_.toInt).getOrElse(0))
    // The parent reads this line from stdout to learn the bound port.
    println(s"GRAFT_MQ_PORT=${server.port}")
    Console.out.flush()
    // Server threads are daemons; park the main thread until the parent
    // destroys the process. The wait sits in a loop (ADVICE r20 #4): a
    // spurious wakeup returning from main would exit the fixture process
    // mid-suite, failing the forked spec nondeterministically.
    val lock = new Object
    lock.synchronized { while (true) lock.wait() }
  }
}
