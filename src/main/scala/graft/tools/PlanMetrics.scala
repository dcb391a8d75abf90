package graft.tools

import graft.queries.GraftQueries
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-NODE metric attribution for one registered query: runs it and
  * prints every physical node (across all inner executions — the pair
  * ops checkpoint intermediates, so the interesting joins live in inner
  * QueryExecutions) whose post-execution metrics carry real volume —
  * spill bytes, shuffle bytes written, broadcast/stage data size, output
  * rows. The layer BENEATH [[ShuffleAudit]]: the audit says a query
  * wrote 12 GB and spilled 11 GB; this says WHICH sort, aggregate, or
  * exchange did it, so a fix targets the node instead of the total
  * (r18 — bought after two blind fix-measure cycles on
  * dedup_jaccard_prefix each cost an 8-minute sf10 run).
  *
  * Usage: runMain graft.tools.PlanMetrics <sfDir> <query> [query...]
  * Thresholds: nodes are printed when spill > 0, shuffle/broadcast
  * bytes > 8 MB, or output rows > 1M — the volumes that matter at scale.
  */
object PlanMetrics {

  private val ByteKeys = Seq("spillSize", "shuffleBytesWritten", "dataSize",
    "bytesWritten", "peakMemory")
  private val RowKeys = Seq("numOutputRows", "shuffleRecordsWritten")

  private def mb(v: Long): String = f"${v / 1048576.0}%.1f MB"

  def report(qe: QueryExecution): Seq[String] = {
    Bridge.flattenExecuted(qe.executedPlan).flatMap { node =>
      val m = Bridge.nodeMetrics(node)
      val spill = m.getOrElse("spillSize", 0L)
      val shuffle = m.getOrElse("shuffleBytesWritten", 0L)
      val data = m.getOrElse("dataSize", 0L)
      val rows = m.getOrElse("numOutputRows", 0L)
      if (spill > 0 || shuffle > (8L << 20) || data > (8L << 20) || rows > 1000000L) {
        val parts =
          ByteKeys.flatMap(k => m.get(k).filter(_ > 0).map(v => s"$k=${mb(v)}")) ++
            RowKeys.flatMap(k => m.get(k).filter(_ > 0).map(v => s"$k=$v"))
        val head = node.simpleStringWithNodeId().linesIterator.next().take(110)
        Some(f"    ${parts.mkString(" ")}%-90s | $head")
      } else None
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanMetrics <sfDir> [--pin] <query> [query...]")
    val dir = args(0)
    val pin = args.contains("--pin")
    val unknownFlags = args.filter(_.startsWith("--")).filterNot(_ == "--pin")
    require(unknownFlags.isEmpty,
      s"unknown flag(s): ${unknownFlags.mkString(", ")} (expected --pin)")
    val queries = args.drop(1).filterNot(_.startsWith("--")).toSeq
    require(queries.nonEmpty, "usage: PlanMetrics <sfDir> [--pin] <query> [query...]")
    val unknown = queries.filterNot(GraftQueries.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    // Same strategy pin as ShuffleAudit --pin: attribution of an audit
    // FAIL must run the PLAN the audit measured.
    if (pin) ShuffleAudit.pinStrategies(spark)
    try {
      for (q <- queries) {
        val captured = new java.util.concurrent.ConcurrentLinkedQueue[QueryExecution]()
        val l = new QueryExecutionListener {
          override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
            captured.add(qe)
          override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
        }
        spark.listenerManager.register(l)
        try {
          GraftQueries.clearRunArtifacts()
          val t0 = System.nanoTime()
          GraftQueries.queries(q)(spark, dir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          Bridge.drainListenerBus(spark)
          println(f"[metrics] $q — ${sec}%.1f s, ${captured.size} execution(s)")
          import scala.jdk.CollectionConverters._
          val dump = sys.env.get("SPARK_GRAFT_PLAN_DUMP").exists(_ == "1")
          captured.asScala.zipWithIndex.foreach { case (qe, i) =>
            val lines = report(qe)
            if (lines.nonEmpty) {
              println(s"  -- execution $i --")
              lines.foreach(println)
              // Full executed tree on demand — when the metric lines say a
              // node is missing or misplaced, this says where it went.
              if (dump) println(qe.executedPlan.toString.linesIterator
                .map("      " + _).mkString("\n"))
            }
          }
        } finally spark.listenerManager.unregister(l)
      }
    } finally {
      if (pin) ShuffleAudit.unpinStrategies(spark)
      spark.stop()
    }
  }
}
