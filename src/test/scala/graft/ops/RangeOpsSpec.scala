package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RangeOpsSpec extends SparkSuite {
  import spark.implicits._

  private def points = Seq((1L, 5L), (2L, 10L), (3L, 29L), (4L, 30L), (5L, 100L))
    .toDF("pid", "pts")
  private def intervals = Seq(
      (10L, 0L, 30L),   // spans 3 buckets at width 10; catches 5,10,29
      (20L, 30L, 31L),  // single point 30
      (30L, 40L, 40L),  // empty (start == end): matches nothing
      (40L, 50L, 45L))  // inverted: matches nothing
    .toDF("iid", "s", "e")

  test("pointInIntervalJoin equals the naive non-equi join") {
    val got = RangeOps.pointInIntervalJoin(points, "pts", intervals, "s", "e", 10L)
      .select("pid", "iid").orderBy("pid", "iid")
      .as[(Long, Long)].collect().toSeq
    val want = points.join(intervals, $"pts" >= $"s" && $"pts" < $"e")
      .select("pid", "iid").orderBy("pid", "iid")
      .as[(Long, Long)].collect().toSeq
    assert(got == want && got == Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L)))
  }

  test("no duplicate matches when an interval spans many buckets") {
    // width 3 → interval [0,30) covers 10 buckets; each match must appear once
    val got = RangeOps.pointInIntervalJoin(points, "pts", intervals, "s", "e", 3L)
      .select("pid", "iid").orderBy("pid", "iid")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L)))
  }

  test("bucketization is exact for nanosecond-scale longs beyond 2^53") {
    val big = 1700000000000000000L // ~1.7e18 epoch nanos
    val p = Seq((1L, big + 1L), (2L, big + 3600L * 1000000000L)).toDF("pid", "pts")
    val i = Seq((9L, big, big + 3600L * 1000000000L)).toDF("iid", "s", "e")
    val got = RangeOps.pointInIntervalJoin(p, "pts", i, "s", "e", 3600L * 1000000000L)
      .select("pid").as[Long].collect().toSeq
    assert(got == Seq(1L)) // end is exclusive; double math would misplace both
  }

  test("random data incl. negatives equals the naive join for several widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val p = (1 to 300).map(i => (i.toLong, rnd.nextLong() % 1000L)).toDF("pid", "pts")
    val iv = (1 to 80).map { i =>
      val s = rnd.nextLong() % 1000L
      (i.toLong + 1000L, s, s + rnd.nextInt(120).toLong)
    }.toDF("iid", "s", "e")
    val want = p.join(iv, $"pts" >= $"s" && $"pts" < $"e")
      .select("pid", "iid").orderBy("pid", "iid").as[(Long, Long)].collect().toSeq
    for (width <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeOps.pointInIntervalJoin(p, "pts", iv, "s", "e", width)
        .select("pid", "iid").orderBy("pid", "iid").as[(Long, Long)].collect().toSeq
      assert(got == want, s"width=$width: ${got.size} vs ${want.size}")
    }
  }

  test("plans an equi-join, not a nested-loop join") {
    val plan = RangeOps.pointInIntervalJoin(points, "pts", intervals, "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("rejects colliding column names") {
    intercept[IllegalArgumentException] {
      RangeOps.pointInIntervalJoin(points, "pts",
        intervals.withColumnRenamed("iid", "pid"), "s", "e", 10L)
    }
  }
}
