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
  * then the 1×wide row pivots to per-column rows with explode(array(
  * struct…)) — at 100 TB a per-column loop would scan the table |cols|
  * times. Min/max compare on the string cast so every column type shares
  * one output schema (binary collation in both Spark and the DuckDB
  * oracle). Built entirely with the DSL on index-keyed internal aliases:
  * user column names appear only as `lit(...)` values and backtick-escaped
  * input references, never interpolated into parsed SQL text, so names
  * containing quotes/backticks/dots cannot break (or inject into) the
  * profiling query.
  */
object StatsOps {

  private def quoted(c: String) = ColNames.quoted(c)

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val in = col(quoted(c))
      Seq(count(in).as(s"_nn_$i"),
        countDistinct(in).as(s"_nd_$i"),
        min(in.cast("string")).as(s"_mn_$i"),
        max(in.cast("string")).as(s"_mx_$i"))
    }
    val wide = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col(s"_nn_$i").as("n_nonnull"),
        col(s"_nd_$i").as("n_distinct"), col(s"_mn_$i").as("min_val"),
        col(s"_mx_$i").as("max_val"))
    }
    wide.select(col("_n").as("n_rows"), explode(array(entries: _*)).as("_e"))
      .select(col("_e.column").as("column"), col("n_rows"),
        col("_e.n_nonnull").as("n_nonnull"), col("_e.n_distinct").as("n_distinct"),
        col("_e.min_val").as("min_val"), col("_e.max_val").as("max_val"))
  }
}
