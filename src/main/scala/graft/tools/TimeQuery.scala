package graft.tools

import graft.queries.GraftQueries


/** Dev tool: time individual queries (post-warmup) without running the
  * whole bench. Usage: runMain graft.tools.TimeQuery <sfDir> <query ...>
  * Env: SPARK_GRAFT_CPUS (default 32, matching Bench).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }
    args.drop(1).foreach { n =>
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = GraftQueries.queries(n)(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      // Cold + warm best-of-2: the warm minimum is what Bench's warm mode
      // reports, so tuning reads the same figure the round records.
      val (cold, rows) = once()
      val warm = math.min(once()._1, once()._1)
      println(f"[time] $n%-28s cold $cold%6.2f s  warm $warm%6.2f s  ($rows rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
