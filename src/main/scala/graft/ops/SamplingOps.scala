package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (north star,
  * SURVEY.md §2.8 — additive; the reference has no sampling surface).
  *
  * Why not `df.sample()`: at 100 TB a sample must be REPRODUCIBLE — stable
  * across retries, re-partitioning, and re-runs on a grown corpus (a doc's
  * membership must not flip because an unrelated doc arrived). Hashing a
  * stable key gives all of that: membership is a pure per-row function, so
  * the "sample" is a codegen'd filter with no shuffle, no RNG state, and
  * the same rows selected on any cluster. md5 (not a seeded JVM hash) so
  * any engine — including the DuckDB oracle — reproduces the selection
  * bit-for-bit.
  */
object SamplingOps {

  /** The project's ONE cross-engine string hash: md5's first 15 hex
    * digits as a 60-bit long. Shared by sampling, winnowing's HOF twin,
    * and the multimodal embed stub — a single definition so the
    * oracle-critical hash cannot drift between call sites (every DuckDB
    * oracle reproduces exactly this expression).
    */
  def md5Prefix60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 60-bit integer hash of (salt ‖ key) — [[md5Prefix60]] of the salted
    * key. Changing `salt` draws an independent sample.
    */
  def hashOf(key: Column, salt: String): Column =
    md5Prefix60(concat(lit(salt), key.cast("string")))

  /** True for rows in a deterministic `keep`/`modulus` sample of `key`
    * (e.g. keep=1, modulus=10 ⇒ a reproducible ~10% sample).
    */
  def hashSampleFlag(key: Column, modulus: Int, keep: Int,
      salt: String = "s"): Column = {
    require(modulus > 0 && keep >= 0 && keep <= modulus)
    pmod(hashOf(key, salt), lit(modulus.toLong)) < keep
  }

  /** Stratified cap: at most `cap` rows per group, chosen by hash order of
    * `key` (deterministic; independent of input order). One shuffle on the
    * group columns — the balance step that keeps a dominant stratum (e.g.
    * one language) from swamping a training mix.
    */
  def stratifiedCap(df: DataFrame, groupCols: Seq[String], cap: Int,
      key: Column, salt: String = "c"): DataFrame = {
    require(cap > 0)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(hashOf(key, salt).asc, key.asc)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= cap)
      .drop("_rk")
  }
}
