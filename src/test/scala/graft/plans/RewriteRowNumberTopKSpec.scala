package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.SparkSession

class RewriteRowNumberTopKSpec extends SparkSuite {

  private val idiom = """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3 ORDER BY o_custkey, o_orderkey"""

  /** Isolated session (shares the SparkContext): the rewrite must not leak
    * into the shared test session, whose window tests exercise the real
    * Window plan.
    */
  private def rewriteSession(): SparkSession = {
    val s = spark.newSession()
    RowNumberTopKRewrite.enable(s)
    s.read.parquet(s"${sf()}/orders.parquet").createOrReplaceTempView("orders")
    s
  }

  test("row_number idiom is rewritten to TopKPerKey and matches the window plan") {
    val s = rewriteSession()
    val rewritten = s.sql(idiom)
    val physical = rewritten.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey"), physical)
    assert(!physical.contains("Window"), physical)

    spark.read.parquet(s"${sf()}/orders.parquet").createOrReplaceTempView("orders")
    val stock = spark.sql(idiom)
    assert(stock.queryExecution.executedPlan.toString.contains("Window"))
    assert(rewritten.collect().toSeq == stock.collect().toSeq)
  }

  test("rewrite declines when rn is kept, filter is compound, or percent_rank is used") {
    val s = rewriteSession()
    val kept = s.sql("""
      SELECT o_custkey, rn FROM (
        SELECT o_custkey, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderkey) AS rn FROM orders) WHERE rn <= 3""")
    assert(kept.queryExecution.executedPlan.toString.contains("Window"))
    val compound = s.sql("""
      SELECT o_custkey, o_orderkey FROM (
        SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderkey) AS rn FROM orders)
      WHERE rn <= 3 AND o_orderkey > 0""")
    assert(compound.queryExecution.executedPlan.toString.contains("Window"))
    // Outside the rank family (a fractional rank has no keep-k form).
    val pct = s.sql("""
      SELECT o_custkey, o_orderkey FROM (
        SELECT o_custkey, o_orderkey, percent_rank() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC) AS pr FROM orders) WHERE pr <= 0.5""")
    assert(pct.queryExecution.executedPlan.toString.contains("Window"))
  }

  /** rank()/dense_rank() <= k rewrite into the keep-ties TopKPerKey modes
    * and must match the stock Window plan row-for-row — ties at the
    * boundary are the interesting rows, so the order key is coarsened
    * (totalprice div 10000) to force them.
    */
  test("rank and dense_rank idioms rewrite to TopKPerKey and match the window plan") {
    for (fn <- Seq("rank", "dense_rank")) {
      val idiomRk = s"""
        SELECT o_custkey, o_orderkey, bucket FROM (
          SELECT o_custkey, o_orderkey,
                 cast(floor(o_totalprice / 10000) as bigint) AS bucket,
                 $fn() OVER (PARTITION BY o_custkey
                   ORDER BY cast(floor(o_totalprice / 10000) as bigint) DESC) AS rnk
          FROM orders)
        WHERE rnk <= 2 ORDER BY o_custkey, o_orderkey"""
      val s = rewriteSession()
      val rewritten = s.sql(idiomRk)
      val physical = rewritten.queryExecution.executedPlan.toString
      assert(physical.contains("TopKPerKey"), s"$fn:\n$physical")
      assert(!physical.contains("Window"), s"$fn:\n$physical")
      spark.read.parquet(s"${sf()}/orders.parquet").createOrReplaceTempView("orders")
      val stock = spark.sql(idiomRk)
      assert(stock.queryExecution.executedPlan.toString.contains("Window"))
      assert(rewritten.collect().toSeq == stock.collect().toSeq, fn)
    }
  }

  test("the q39 gate query actually runs through the rewritten operator") {
    val q39 = graft.queries.GraftQueries.all.find(_.name == "q39_rank_topk").get
    val physical = q39.fn(spark, sf()).queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey") && !physical.contains("Window"), physical)
  }

  test("the q33 gate query actually runs through the rewritten operator") {
    val q33 = graft.queries.GraftQueries.all.find(_.name == "q33_topk_rewrite").get
    val physical = q33.fn(spark, sf()).queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey") && !physical.contains("Window"), physical)
  }

  test("rewrite handles rn < k and top-1 equality forms") {
    val s = rewriteSession()
    val lt = s.sql("""
      SELECT o_custkey, o_orderkey FROM (
        SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) WHERE rn < 4
      ORDER BY o_custkey, o_orderkey""")
    assert(lt.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val eq = s.sql("""
      SELECT o_custkey, o_orderkey FROM (
        SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) WHERE rn = 1
      ORDER BY o_custkey""")
    assert(eq.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(eq.count() == s.sql("SELECT count(DISTINCT o_custkey) FROM orders")
      .collect().head.getLong(0))
  }
}
