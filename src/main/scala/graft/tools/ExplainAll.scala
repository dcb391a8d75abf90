package graft.tools

import graft.queries.GraftQueries
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev tool: run a registered query and dump `explain("formatted")` for
  * EVERY inner QueryExecution (the pair ops eagerly checkpoint
  * intermediates, so the final frame's plan alone shows a LogicalRDD
  * scan where the interesting joins ran — [[ExplainDump]] only sees the
  * tail). One file per query under the output dir: the before/after
  * plan evidence for optimization rounds.
  *
  * Usage: runMain graft.tools.ExplainAll <sfDir> <outDir> <query> [query...]
  * Env: SPARK_GRAFT_CPUS (default 32, matching Bench).
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainAll <sfDir> <outDir> <query> [query...]")
    val dir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val queries = args.drop(2).toSeq
    val unknown = queries.filterNot(GraftQueries.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
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
        val df = GraftQueries.queries(q)(spark, dir)
        val rows = df.count()
        Bridge.drainListenerBus(spark)
        import scala.jdk.CollectionConverters._
        val sb = new StringBuilder
        sb ++= s"== $q ($rows rows) — ${captured.size} inner execution(s) + final ==\n"
        captured.asScala.zipWithIndex.foreach { case (qe, i) =>
          sb ++= s"\n---------- inner execution $i ----------\n"
          sb ++= qe.explainString(org.apache.spark.sql.execution.FormattedMode)
        }
        sb ++= "\n---------- final frame ----------\n"
        sb ++= df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(outDir.resolve(s"$q.txt"), sb.toString)
        println(s"[explain-all] $q -> ${outDir.resolve(s"$q.txt")}")
      } finally spark.listenerManager.unregister(l)
    }
    spark.stop()
  }
}
