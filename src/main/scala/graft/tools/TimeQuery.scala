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
      val t0 = System.nanoTime()
      val rows = GraftQueries.queries(n)(spark, sfDir).count()
      println(f"[time] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
