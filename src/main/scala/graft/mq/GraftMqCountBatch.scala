package graft.mq

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory}

/** An aggregation the MQ scan can answer by OFFSET ARITHMETIC alone
  * ([[GraftMqScanBuilder.pushAggregation]]): `count(*)` is range width,
  * `min(offset)`/`max(offset)` are the range ends, and `GROUP BY
  * partition` is the per-partition form of each — the partition IS the
  * range key. Anything touching message VALUES (other columns, count of
  * a nullable column, timestamp min/max under non-monotonic
  * producer-supplied timestamps) is rejected and keeps the row path.
  */
final case class MqPushedAggregation(groupByPartition: Boolean,
    cols: Seq[MqPushedAggregation.Col]) extends Serializable

object MqPushedAggregation {
  sealed trait Col extends Serializable
  case object CountAll extends Col
  case object MinOffset extends Col
  case object MaxOffset extends Col
}

/** Batch plan for a pushed-down offset-arithmetic aggregation: the answer
  * is computed from the SAME per-partition `[start, end)` ranges the row
  * scan would read, so NOT ONE message is fetched — at 100 TB counting a
  * topic (or locating its offset bounds) costs a handful of plan-time
  * metadata lookups (end/earliest offsets, the exact calls the row
  * planner already makes) instead of a full log read.
  *
  * Range resolution is delegated to [[GraftMqBatch.plannedRanges]] — the
  * one implementation of start-mode resolution, `endingOffsets` bounds,
  * and `failOnDataLoss` semantics — so the answered rows are by
  * construction over the rows the row reader would have produced (offsets
  * in this MQ model are dense; a start past retention aborts or clamps at
  * plan time exactly as the row path does). Results are computed on the
  * driver and shipped as ONE single-partition task: COMPLETE pushdown
  * means the engine consumes them as the final result with no re-agg.
  * Row semantics match a row-based aggregate exactly:
  *
  *  - ungrouped: always one row; `count(*)` 0 and `min`/`max` NULL when
  *    every planned range is empty (SQL's empty-input aggregate row);
  *  - `GROUP BY partition`: one row per NONEMPTY partition — a row-based
  *    group-by never emits a group with no rows.
  *
  * Mid-query truncation caveat (shared with every log-backed scan): the
  * answer is plan-time-consistent. A broker truncating between planning
  * and execution would fail or shrink a ROW read at fetch time, while
  * this path — resolved wholly at plan time — keeps the planned answer.
  */
class GraftMqCountBatch(opts: GraftMqOptions, agg: MqPushedAggregation)
    extends Batch {
  import MqPushedAggregation._

  // The minimal schema keeps the delegate's construction trivially cheap;
  // plannedRanges never touches payload fields.
  private val resultRows: Seq[Seq[Any]] = {
    val ranges = new GraftMqBatch(opts, GraftMqOptions.minimalSchema)
      .plannedRanges.toSeq.sortBy(_._1)
    val nonEmpty = ranges.filter { case (_, (s, e)) => e > s }
    if (agg.groupByPartition)
      nonEmpty.map { case (p, (s, e)) =>
        p +: agg.cols.map[Any] {
          case CountAll => e - s
          case MinOffset => s
          case MaxOffset => e - 1
        }
      }
    else
      Seq(agg.cols.map[Any] {
        case CountAll =>
          ranges.iterator.map { case (_, (s, e)) => math.max(0L, e - s) }.sum
        case MinOffset =>
          if (nonEmpty.isEmpty) null else nonEmpty.map(_._2._1).min
        case MaxOffset =>
          if (nonEmpty.isEmpty) null
          else nonEmpty.map { case (_, (_, e)) => e - 1 }.max
      })
  }

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftMqCountPartition(resultRows))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftMqCountReaderFactory
}

/** The pre-computed result rows of a pushed aggregation (≤ one per MQ
  * partition — driver-bounded by construction).
  */
final case class GraftMqCountPartition(rows: Seq[Seq[Any]])
    extends InputPartition

class GraftMqCountReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = p.asInstanceOf[GraftMqCountPartition].rows.iterator
      private var current: InternalRow = _
      override def next(): Boolean =
        if (!it.hasNext) false
        else { current = InternalRow.fromSeq(it.next()); true }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}
