package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale/skew techniques as reusable combinators. These change the PLAN,
  * never the RESULT — each has an oracle-checked query proving value
  * equality with the naive formulation.
  */
object ScaleOps {

  /** Two-stage salted aggregation: a skewed grouping key is sharded into
    * `salt` sub-keys for the first (heavy) shuffle, then partials combine
    * in a second, tiny shuffle. Count/sum-style aggregates recombine
    * exactly; with decimal sums the result is bit-identical to the direct
    * groupBy. The salt is a deterministic hash of `saltBy` (not rand()) so
    * replays/retries see stable assignments.
    *
    * At 100 TB this is the standard fix when one key holds a large share
    * of rows and AQE's skew handling cannot split a single hash partition
    * of an aggregation.
    */
  def saltedCountSum(df: DataFrame, key: String, sumExprSql: String,
      saltBy: Column, salt: Int = 16): DataFrame = {
    require(salt > 0)
    val stage1 = df
      .withColumn("_salt", pmod(crc32(saltBy.cast("string")), lit(salt)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), expr(sumExprSql).as("_s"))
    stage1.groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("s"))
  }
}
