package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range-join operators for the LLM-pipeline extension surface (SURVEY.md
  * §2.3 notes the reference itself has no joins; this is the scale path
  * for the one join shape Catalyst plans badly).
  *
  * A point-in-interval join (`p.ts BETWEEN i.start AND i.end`) has no
  * equi-key, so stock Spark plans BroadcastNestedLoopJoin — O(|points| ×
  * |intervals|) comparisons and a broadcast that dies when the interval
  * side is large. Bucketizing turns it into an equi-join: each interval
  * registers in every fixed-width bucket it overlaps, each point in
  * exactly one, and the bucket equi-join + residual range filter finds
  * every match exactly once (an interval covers a point's bucket at most
  * once, so no dedup is needed).
  *
  * Shuffle volume: |points| + Σ(interval span / bucketWidth). Choose
  * `bucketWidth` near the typical interval length — each interval then
  * lands in ~2 buckets and the join is linear in its inputs.
  */
object RangeOps {

  /** Join `points` to every interval (inclusive start, exclusive end)
    * containing them. Column names must be disjoint across the two
    * inputs. Point/start/end columns must be integral (e.g. epoch nanos):
    * bucketing uses long `div` arithmetic — nanosecond epochs exceed the
    * 2^53 exact-integer range where a double-based floor would corrupt.
    */
  def pointInIntervalJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"pointInIntervalJoin: column names collide across inputs: ${overlap.mkString(", ")}")
    def quoted(name: String): String = ColNames.quoted(name)
    val (p, s, e) = (quoted(pointCol), quoted(startCol), quoted(endCol))
    val ip = intervals
      .filter(col(s) < col(e)) // empty/inverted intervals match nothing
      .withColumn("_g_bucket", explode(sequence(
        expr(s"$s div ${bucketWidth}L"),
        expr(s"($e - 1) div ${bucketWidth}L"))))
    val pp = points.withColumn("_g_bucket", expr(s"$p div ${bucketWidth}L"))
    pp.join(ip,
        pp("_g_bucket") === ip("_g_bucket") &&
        col(p) >= col(s) && col(p) < col(e))
      .drop("_g_bucket")
  }
}
