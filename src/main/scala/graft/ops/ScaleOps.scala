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

  /** Salted equi-join for a skewed LARGE-side join key: every large-side
    * row gets a deterministic salt in [0, salt) and the small side is
    * replicated once per salt value, so a hot key's rows land on `salt`
    * reducers instead of one. Result is exactly the plain inner
    * equi-join; cost is |small| × salt extra build rows.
    *
    * Only worth it for shuffle joins (sort-merge / shuffled-hash) where
    * the small side exceeds the broadcast threshold but one large-side
    * key dominates — a broadcast join has no shuffle to skew, and AQE's
    * skew-join can only split whole partitions, not one hot key. `saltBy`
    * should be a high-cardinality large-side column (e.g. its primary
    * key) so the hot key spreads evenly; it is hashed (not `rand()`) so
    * task retries see stable assignments.
    */
  /** The shard assignment used by [[saltedJoin]] — exposed so tests
    * assert the spread of the PRODUCTION formula, not a copy that can
    * drift. coalesce: a NULL saltBy value must still salt somewhere — a
    * null salt would null the join condition and silently drop rows that
    * a plain join (with a non-null key) would keep.
    */
  private[graft] def saltExpr(saltBy: Column, salt: Int): Column =
    pmod(coalesce(crc32(saltBy.cast("string")), lit(0L)), lit(salt.toLong))

  def saltedJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String,
      saltBy: Column, salt: Int = 16): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val l = large.withColumn("_salt_l", saltExpr(saltBy, salt))
    val r = small.withColumn("_salt_r",
      explode(sequence(lit(0L), lit((salt - 1).toLong))))
    l.join(r, col(largeKey) === col(smallKey) && col("_salt_l") === col("_salt_r"))
      .drop("_salt_l", "_salt_r")
  }
}
