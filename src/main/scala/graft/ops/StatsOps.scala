package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  // --------------------------------------------------- Count-Min sketch

  /** The repo's replayable 60-bit hash (md5-prefix idiom, same as the
    * sampling ops): non-negative, reproducible from scratch by any engine
    * with md5 — which is what lets a CMS built here be verified
    * value-exactly by an external replay.
    */
  private def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def cmsBucket(token: Column, row: Column, width: Int): Column =
    pmod(hash60(concat(row.cast("string"), lit("|"), token)), lit(width.toLong))

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) of token frequencies,
    * as PURE relational algebra: explode tokens × `depth` hash rows,
    * bucket each (row, token) with the md5-prefix hash, and count per
    * (row, bucket). The aggregate has at most `depth × width` groups, so
    * the per-task hash-agg state is CONSTANT-bounded no matter the corpus
    * — the CMS memory guarantee falls out of Catalyst's own partial
    * aggregation (map-side combine over a bounded key space ≈ the
    * sketch's update loop; the final shuffle carries ≤ depth × width rows
    * per partition). No custom aggregate needed, everything stays inside
    * whole-stage codegen.
    *
    * Output: (row, bucket, cnt) — ≤ depth×width rows, broadcastable by
    * construction. Estimates are read with [[cmsEstimate]]; the standard
    * guarantee `true ≤ est ≤ true + εN` (ε = e/width, with probability
    * 1 − e^−depth) holds for ANY fixed hash family, including this
    * replayable one.
    */
  def cmsSketch(docs: DataFrame, depth: Int = 4, width: Int = 1024,
      textCol: String = "text"): DataFrame = {
    require(depth >= 1 && depth <= 16, s"cms depth=$depth outside 1..16")
    require(width >= 2, s"cms width=$width must be >= 2")
    docs
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .select(col("token"),
        explode(array((0 until depth).map(lit): _*)).as("row"))
      .groupBy(col("row"), cmsBucket(col("token"), col("row"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[cmsSketch]] built from a PRE-AGGREGATED (token, count) frame —
    * identical output by algebra: a (row, bucket) counter is the sum of
    * the counts of every token hashing there, so summing exact per-token
    * counts equals counting raw occurrences. For callers that already
    * hold an exact token-count frame (the registered stats_cms_freq
    * derives its probe set from one), this prices the sketch at
    * depth × |vocabulary| bucket hashes instead of depth × |occurrences|
    * (the md5 bucket hash is the sketch build's hot expression) and
    * skips re-tokenizing the corpus. The aggregate keeps the
    * ≤ depth × width group bound — the CMS memory guarantee — while the
    * vocabulary-sized INPUT is the caller's own frame, already paid for.
    */
  def cmsSketchFromCounts(tokenCounts: DataFrame, depth: Int = 4,
      width: Int = 1024, tokenCol: String = "token",
      countCol: String = "cnt"): DataFrame = {
    require(depth >= 1 && depth <= 16, s"cms depth=$depth outside 1..16")
    require(width >= 2, s"cms width=$width must be >= 2")
    tokenCounts
      .select(col(tokenCol).as("token"), col(countCol).as("c"),
        explode(array((0 until depth).map(lit): _*)).as("row"))
      .groupBy(col("row"), cmsBucket(col("token"), col("row"), width).as("bucket"))
      .agg(sum(col("c")).as("cnt"))
  }

  /** Point estimates from a [[cmsSketch]]: for each probe token, the MIN
    * over hash rows of its bucket's counter (absent bucket = 0). The
    * sketch is ≤ depth×width rows, so it broadcasts — estimating any
    * number of probes costs one map-side join, never a shuffle of the
    * probe stream. `depth`/`width` must match the sketch's build
    * parameters (bucket recomputation is deterministic, so a mismatch is
    * a caller bug, not silent corruption — buckets simply miss and
    * estimates floor at 0, which the `est >= true` property spec would
    * catch).
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, depth: Int = 4,
      width: Int = 1024, tokenCol: String = "token"): DataFrame = {
    val keyed = probes
      .select(col(tokenCol).as("token"),
        explode(array((0 until depth).map(lit): _*)).as("row"))
      .select(col("token"), col("row"),
        cmsBucket(col("token"), col("row"), width).as("bucket"))
    keyed
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }
}
