package graft.tools

import graft.queries.GraftQueries
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev tool: wall-time attribution across the INNER executions of one
  * registered query (pricing jobs, cached-frame materializations, the
  * main pipeline, the final count) — the layer between TimeQuery's one
  * number and PlanMetrics' per-node bytes: WHICH action inside an
  * operator owns the wall time, so a fix targets the expensive pass
  * instead of the query total. Prints each execution's listener-reported
  * duration plus its root node line, warm (second run) after a cold one.
  *
  * Usage: runMain graft.tools.JobProfile <sfDir> <query> [query...]
  * Env: SPARK_GRAFT_CPUS (default 32, matching Bench);
  * SPARK_GRAFT_PROFILE_KEEP=1 keeps session run artifacts between the
  * cold and profiled passes — the profiled pass then measures the same
  * memoized-serving path Bench's WARM sweeps time, instead of the
  * artifact-rebuild (cold) path.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <sfDir> <query> [query...]")
    val dir = args(0)
    val queries = args.drop(1).toSeq
    val unknown = queries.filterNot(GraftQueries.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    try spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }
    val keepArtifacts = sys.env.get("SPARK_GRAFT_PROFILE_KEEP").contains("1")
    for (q <- queries) {
      // Cold pass (untimed detail): codegen + IO init land here.
      if (!keepArtifacts) GraftQueries.clearRunArtifacts()
      GraftQueries.queries(q)(spark, dir).count()
      // Warm pass with per-execution attribution.
      val captured = new java.util.concurrent.ConcurrentLinkedQueue[(QueryExecution, Long)]()
      val l = new QueryExecutionListener {
        override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
          captured.add((qe, d))
        override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
      }
      spark.listenerManager.register(l)
      try {
        if (!keepArtifacts) GraftQueries.clearRunArtifacts()
        val t0 = System.nanoTime()
        GraftQueries.queries(q)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Bridge.drainListenerBus(spark)
        import scala.jdk.CollectionConverters._
        println(f"[profile] $q warm ${sec}%.2f s, ${captured.size} execution(s)")
        var acct = 0.0
        captured.asScala.foreach { case (qe, d) =>
          val head = qe.executedPlan.simpleStringWithNodeId()
            .linesIterator.next().take(100)
          acct += d / 1e9
          println(f"    ${d / 1e9}%6.2f s | $head")
        }
        println(f"    ${acct}%6.2f s accounted (driver-side gaps = warm - accounted)")
      } finally spark.listenerManager.unregister(l)
    }
    spark.stop()
  }
}
