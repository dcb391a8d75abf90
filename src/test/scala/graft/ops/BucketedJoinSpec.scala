package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the 100 TB technique for repeatedly
  * joined fact tables (SURVEY.md §2.8 "100 TB posture"): write both sides
  * bucketed by the join key once, and every subsequent join on that key
  * runs WITHOUT a shuffle exchange (each bucket pair joins locally).
  */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed tables join without a shuffle exchange") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val lineitem = spark.read.parquet(s"${sf()}/lineitem.parquet")

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    // Force the sort-merge path (at this tiny SF Spark would broadcast,
    // which is also shuffle-free but doesn't exercise the bucket layout).
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

    // Execute first (finalizes AQE), compare values, then inspect the
    // final plan beneath the AdaptiveSparkPlan wrapper.
    val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)

    // AQE wraps stages in QueryStageExec leaves that `collect` does not
    // traverse — assert on the full final plan text instead: the join is
    // sort-merge, and NO exchange hashes the join keys (the only exchange
    // allowed is the final aggregation's, on o_orderpriority).
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("SortMergeJoin"),
      s"expected a sort-merge join, plan:\n$planStr")
    assert(!planStr.contains("hashpartitioning(l_orderkey")
        && !planStr.contains("hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle its inputs, plan:\n$planStr")

    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
