package graft.tools

import graft.queries.GraftQueries


/** Dev tool: dump formatted physical plans for the named queries (or a
  * default plan-review set) so pushdown/broadcast/codegen can be eyeballed.
  * Usage: runMain graft.tools.ExplainDump [sfDir] [query ...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_filter_pushdown", "q05_region_nation_revenue",
        "q01_pricing_summary", "dedup_minhash_lsh", "sim_topk_bruteforce")
    val spark = graft.Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      GraftQueries.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
