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
    * @param rightPayload right columns to carry (must not collide with
    *                     left column names)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.nonEmpty, "asOfJoin: nothing to attach")
    val l = left.withColumn("_side", lit(1)).withColumn("_ats", col(leftTs))
    val r = right.select((Seq(col(key), col(rightTs).as("_ats")) ++
        rightPayload.map(col)): _*)
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort BEFORE left rows at equal timestamps (_side 0 < 1),
    // making the match inclusive (right.ts == left.ts matches); the right
    // timestamp itself tie-breaks equal-key-equal-ts right rows.
    val w = Window.partitionBy(key)
      .orderBy(col("_ats").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    attached.filter(col("_side") === 1).drop("_side", "_ats")
  }
}
