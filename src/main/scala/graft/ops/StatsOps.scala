package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling for pipeline data QA: per-column row/non-null/distinct
  * counts and min/max, the health report run before and after every
  * expensive pipeline stage (a dedup pass that nulled a key, a join that
  * dropped a language — cheaper to catch here than three stages later).
  *
  * ONE pass over the input: all columns' aggregates go into a single
  * `agg` (Catalyst plans the multi-distinct via expand + one shuffle),
  * then the 1×wide row pivots to per-column rows with `stack` — at 100 TB
  * a per-column loop would scan the table |cols| times. Min/max compare
  * on the string cast so every column type shares one output schema
  * (binary collation in both Spark and the DuckDB oracle).
  */
object StatsOps {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        min(col(c).cast("string")).as(s"_mn_$c"),
        max(col(c).cast("string")).as(s"_mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val stackArgs = cols.map(c => s"'$c', `_nn_$c`, `_nd_$c`, `_mn_$c`, `_mx_$c`")
      .mkString(", ")
    wide.selectExpr("_n as n_rows",
        s"stack(${cols.size}, $stackArgs) as (column, n_nonnull, n_distinct, min_val, max_val)")
      .select("column", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val")
  }
}
