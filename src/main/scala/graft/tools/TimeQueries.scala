package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted per-query timing CLI — the fast feedback loop while tuning a
  * single operator (Bench sweeps all queries and takes ~10 min):
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt -batch "runMain graft.tools.TimeQueries dedup_minhash_lsh ..."
  * }}}
  *
  * Prints cold + warm-min(2) seconds per named query after the same
  * untimed warmup Bench uses. Not part of any driver contract.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQueries <queryName>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession =
      graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => () }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm = math.min(once(), once())
      println(f"[time] $name%-32s cold $cold%6.2f s  warm $warm%6.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
