package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark lacks natively, composed Spark-first — per the
  * custom-operator preference order (SURVEY.md §2.8) an as-of join needs
  * no custom plan node: a tagged union + one per-key ordered window
  * expresses it exactly, in ONE shuffle+sort per key column, with no
  * row-multiplying range join anywhere.
  *
  * Scale shape: |L|+|R| rows shuffle once on the key, each partition does
  * a single timestamp sort, and `last(ignoreNulls)` streams forward — the
  * same access pattern a hand-written merge-join-style SparkPlan would
  * have, but planned by Catalyst (codegen'd window, AQE-sized exchange).
  */
object TemporalOps {

  /** As-of join: for each left row, attach the payload of the LATEST right
    * row with the same `key` and `right.tsCol <= left.tsCol` (inclusive).
    * Left rows with no prior right row get null payloads (left-asof).
    *
    * The payload travels as ONE packed struct, which makes the operator
    * deterministic and null-safe: among right rows tied on (key, ts) the
    * struct itself is the final window sort key (so `last()` always picks
    * the struct-maximal row, not a partition-order-dependent one), and a
    * right row whose payload fields are all NULL still has a non-null
    * struct, so it is attached as NULLs rather than silently skipped in
    * favor of an older row.
    *
    * @param rightPayload right columns to carry; must not collide with
    *                     left column names (enforced) and must be of
    *                     orderable types (no maps — they can't tie-break)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.nonEmpty, "asOfJoin: nothing to attach")
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"asOfJoin: rightPayload collides with left columns: ${collisions.mkString(", ")}")
    val l = left.withColumn("_side", lit(1)).withColumn("_ats", col(leftTs))
    // Right rows with NULL timestamp can never satisfy right.ts <= left.ts
    // (SQL: NULL <= x is not true). Unfiltered they would sort FIRST
    // (ascending = NULLS FIRST) and be attached as "earlier than
    // everything" — diverging from the DuckDB native ASOF oracle. NULL
    // KEYS likewise never match in a join (NULL = NULL is not true), but
    // Window.partitionBy groups all nulls into ONE partition — so
    // null-keyed right rows are dropped too, which leaves null-keyed left
    // rows alone in their partition and correctly unmatched.
    val r = right.filter(col(rightTs).isNotNull && col(key).isNotNull)
      .select(col(key), col(rightTs).as("_ats"),
        struct(rightPayload.map(col): _*).as("_pay"))
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort BEFORE left rows at equal timestamps (_side 0 < 1),
    // making the match inclusive (right.ts == left.ts matches); the packed
    // payload struct deterministically tie-breaks equal-key-equal-ts right
    // rows (left rows carry a NULL struct, ignored by last(ignoreNulls)).
    val w = Window.partitionBy(key)
      .orderBy(col("_ats").asc, col("_side").asc, col("_pay").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = unioned.withColumn("_pay", last(col("_pay"), ignoreNulls = true).over(w))
    rightPayload.foldLeft(attached) { (df, c) =>
        df.withColumn(c, col("_pay").getField(c))
      }
      .filter(col("_side") === 1).drop("_side", "_ats", "_pay")
  }
}
