package graft.tools

import graft.queries.GraftQueries

/** Dev tool: INTERLEAVED A/B of one registered query under two values of
  * one session conf — the controlled measurement for adaptive-switch
  * tuning (the DrainProbe lesson: ambient machine drift between two
  * separate runs swamps sub-second deltas; alternating legs inside one
  * session cancels monotone drift, and best-of-N absorbs one bad sample
  * per leg).
  *
  * Usage: runMain graft.tools.ConfAB <sfDir> <query> <confKey> <valA> <valB> [rounds]
  * The literal value `unset` (or an empty string) means "conf unset"
  * (the adaptive default) — sbt's runMain passes quoted empties through
  * verbatim, so a plain word is the reliable sentinel.
  * Env: SPARK_GRAFT_CPUS (default 32, matching Bench).
  */
object ConfAB {
  def main(args: Array[String]): Unit = {
    require(args.length >= 5,
      "usage: ConfAB <sfDir> <query> <confKey> <valA> <valB> [rounds]")
    val Seq(sfDir, query, key, valA, valB) = args.take(5).toSeq
    val rounds = if (args.length > 5) args(5).toInt else 3
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }
    def leg(v: String): Double = {
      if (v.isEmpty || v == "unset" || v == "''") spark.conf.unset(key)
      else spark.conf.set(key, v)
      val t0 = System.nanoTime()
      GraftQueries.queries(query)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // Untimed warmup leg per value so codegen/caches don't land on leg 1.
    leg(valA); leg(valB)
    val samples = (0 until rounds).flatMap { i =>
      val pair = Seq("A" -> valA, "B" -> valB)
      (if (i % 2 == 0) pair else pair.reverse).map { case (tag, v) =>
        val s = leg(v)
        println(f"[ab] round $i $tag ($key=${if (v.isEmpty) "<unset>" else v}) $s%6.2f s")
        tag -> s
      }
    }
    def best(tag: String) = samples.collect { case (`tag`, s) => s }.min
    println(f"[ab] $query best A=${best("A")}%6.2f s  best B=${best("B")}%6.2f s")
    spark.stop()
  }
}
