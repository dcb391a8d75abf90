package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSuite {

  test("topKPerKey matches the row_number window formulation") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val got = GraftPlans.topKPerKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
      .collect().toSeq
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val want = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
      .collect().toSeq
    assert(got == want)
  }

  test("topKPerKey keeps whole groups smaller than k") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
      .repartition(4) // spread rows so partial heaps see partial groups
    val got = GraftPlans.topKPerKey(df, Seq("k"), Seq(("v", true)), 5)
      .orderBy("k", "v").as[(String, Int)].collect().toSeq
    assert(got == Seq(("a", 1), ("a", 2), ("b", 3)))
  }

  test("topKPerKey plans a partial/final pair with one exchange and no sort") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val df = GraftPlans.topKPerKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val physical = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(physical).size == 2, physical)
    assert("Exchange".r.findAllIn(physical).size == 1, physical)
    assert(!physical.contains("Sort "), physical)
    // partial=true below the exchange, final above it
    assert(physical.indexOf(", true") > physical.indexOf("Exchange"), physical)
    assert(physical.indexOf(", false") < physical.indexOf("Exchange"), physical)
  }

  test("column pruning reaches the scan through the custom node") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val df = GraftPlans.topKPerKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(scan.contains("o_custkey") && scan.contains("o_totalprice"), scan)
    assert(!scan.contains("o_orderpriority") && !scan.contains("o_orderstatus"), scan)
  }

  test("topKPerKey equals the window formulation on random data with ties and nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map { i =>
      val k = if (rnd.nextInt(20) == 0) null else s"k${rnd.nextInt(30)}"
      val v: java.lang.Double =
        if (rnd.nextInt(10) == 0) null else rnd.nextInt(50).toDouble // many ties
      (k, v, i.toLong) // i = unique tie-break
    }
    val df = rows.toDF("k", "v", "id").repartition(7)
    val got = GraftPlans.topKPerKey(df, Seq("k"), Seq(("v", false), ("id", true)), 5)
      .orderBy($"k".asc_nulls_first, $"id")
      .collect().toSeq
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .drop("rn").orderBy($"k".asc_nulls_first, $"id")
      .collect().toSeq
    assert(got == want, s"${got.size} vs ${want.size}")
  }

  test("partial stage flushes at the key cap without changing results") {
    import spark.implicits._
    // 400 distinct keys through a cap of 16 forces many mid-partition
    // flushes; results must still equal the window formulation because the
    // final stage re-merges whatever the partial emitted.
    val saved = TopKPerKeyExec.PartialMaxKeys
    try {
      TopKPerKeyExec.PartialMaxKeys = 16
      val rnd = new scala.util.Random(7)
      val df = (1 to 4000).map(i => (s"k${rnd.nextInt(400)}", rnd.nextInt(1000), i.toLong))
        .toDF("k", "v", "id").repartition(3)
      val got = GraftPlans.topKPerKey(df, Seq("k"), Seq(("v", true), ("id", true)), 2)
        .orderBy("k", "id").collect().toSeq
      val w = Window.partitionBy("k").orderBy(col("v").asc, col("id").asc)
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .drop("rn").orderBy("k", "id").collect().toSeq
      assert(got == want, s"${got.size} vs ${want.size}")
    } finally TopKPerKeyExec.PartialMaxKeys = saved
  }

  test("q32's registered plan stays exact through the key-cap flush path") {
    // Drive MORE distinct keys than PartialMaxKeys through the actual
    // registered query (not a toy frame): with the cap forced below q32's
    // ~200 custkeys the partial stage must flush mid-partition, the
    // partialFlushes metric must record it, and the rows must still be
    // value-identical to the uncapped plan.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE wraps materialized stages in leaf QueryStageExec nodes; recurse
    // through them or the executed operators are invisible to collect.
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case q: QueryStageExec => q +: allNodes(q.plan)
      case other => other +: other.children.flatMap(allNodes)
    }
    def runQ32(): (Seq[org.apache.spark.sql.Row], Long) = {
      val df = graft.SparkEntry.queries("q32_topk_plan")(spark, sf())
      val rows = df.collect().toSeq
      val flushes = allNodes(df.queryExecution.executedPlan).collect {
        case t: TopKPerKeyExec if t.partial => t.metrics("partialFlushes").value
      }.sum
      (rows, flushes)
    }
    val saved = TopKPerKeyExec.PartialMaxKeys
    val (want, flushesUncapped) = try {
      TopKPerKeyExec.PartialMaxKeys = Int.MaxValue
      runQ32()
    } finally TopKPerKeyExec.PartialMaxKeys = saved
    assert(flushesUncapped == 0L, "uncapped run must never flush")
    val (got, flushesCapped) = try {
      TopKPerKeyExec.PartialMaxKeys = 16
      runQ32()
    } finally TopKPerKeyExec.PartialMaxKeys = saved
    assert(flushesCapped > 0L, "capped run must exercise the flush path")
    assert(got == want, s"${got.size} vs ${want.size} rows")
  }

  test("RankMode keeps boundary ties; DenseRankMode keeps k distinct values") {
    import spark.implicits._
    // Group a under v asc: values 1,1,2,2,2,9. rank<=3 keeps 1,1,2,2,2
    // (rank of the 2s is 3); dense_rank<=3 would ALSO keep 9 (3rd distinct
    // value) — the two modes must disagree exactly there. Group b is
    // all-ties: rank 1 for every row.
    val df = Seq(
      ("a", 1, 1L), ("a", 1, 2L), ("a", 2, 3L), ("a", 2, 4L), ("a", 2, 5L), ("a", 9, 6L),
      ("b", 7, 7L), ("b", 7, 8L), ("b", 7, 9L)).toDF("k", "v", "id")
      .repartition(4) // partial stages see partial groups
    val rank = GraftPlans.topKPerKey(df, Seq("k"), Seq(("v", true)), 3, RankMode)
      .orderBy("k", "id").as[(String, Int, Long)].collect().toSeq
    assert(rank == Seq(
      ("a", 1, 1L), ("a", 1, 2L), ("a", 2, 3L), ("a", 2, 4L), ("a", 2, 5L),
      ("b", 7, 7L), ("b", 7, 8L), ("b", 7, 9L)))
    val dense = GraftPlans.topKPerKey(df, Seq("k"), Seq(("v", true)), 3, DenseRankMode)
      .orderBy("k", "id").as[(String, Int, Long)].collect().toSeq
    assert(dense == Seq(
      ("a", 1, 1L), ("a", 1, 2L), ("a", 2, 3L), ("a", 2, 4L), ("a", 2, 5L), ("a", 9, 6L),
      ("b", 7, 7L), ("b", 7, 8L), ("b", 7, 9L)))
  }

  test("rank modes equal the window formulation on random ties, incl. the flush path") {
    import spark.implicits._
    val saved = TopKPerKeyExec.PartialMaxKeys
    try {
      TopKPerKeyExec.PartialMaxKeys = 16 // force mid-partition flushes (400 keys)
      val rnd = new scala.util.Random(13)
      val df = (1 to 4000).map(i =>
          (s"k${rnd.nextInt(400)}", rnd.nextInt(8), i.toLong)) // 8 values → heavy ties
        .toDF("k", "v", "id").repartition(3)
      for ((mode, fn) <- Seq[(TopKMode, org.apache.spark.sql.Column)](
          (RankMode, rank().over(Window.partitionBy("k").orderBy(col("v").asc))),
          (DenseRankMode, dense_rank().over(Window.partitionBy("k").orderBy(col("v").asc))))) {
        val got = GraftPlans.topKPerKey(df, Seq("k"), Seq(("v", true)), 2, mode)
          .orderBy("k", "id").collect().toSeq
        val want = df.withColumn("rn", fn).filter(col("rn") <= 2)
          .drop("rn").orderBy("k", "id").collect().toSeq
        assert(got == want, s"$mode: ${got.size} vs ${want.size}")
      }
    } finally TopKPerKeyExec.PartialMaxKeys = saved
  }

  test("topKPerKey resolves columns case-insensitively and rejects unknowns") {
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("k", "v")
    assert(GraftPlans.topKPerKey(df, Seq("K"), Seq(("V", true)), 1).count() == 1)
    intercept[IllegalArgumentException] {
      GraftPlans.topKPerKey(df, Seq("nope"), Seq(("v", true)), 1)
    }
  }
}
