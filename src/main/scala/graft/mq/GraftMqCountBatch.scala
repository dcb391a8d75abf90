package graft.mq

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory}

/** Batch plan for a pushed-down `count(*)` ([[GraftMqScanBuilder]]
  * `pushAggregation`): the answer is Σ (until − from) over the SAME
  * per-partition ranges the row scan would read, so NOT ONE message is
  * fetched — at 100 TB a topic count costs a handful of plan-time
  * metadata lookups (end/earliest offsets, the exact calls the row
  * planner already makes) instead of a full log read.
  *
  * Range resolution is delegated to [[GraftMqBatch.plannedRanges]] — the
  * one implementation of start-mode resolution, `endingOffsets` bounds,
  * and `failOnDataLoss` semantics — so the counted rows are by
  * construction the rows the row reader would have produced (offsets in
  * this MQ model are dense; a start past retention aborts or clamps at
  * plan time exactly as the row path does). The count is computed on the
  * driver and shipped as ONE single-row partition: the total is already a
  * scalar, and COMPLETE pushdown means the engine consumes the row as the
  * final result with no re-aggregation.
  *
  * Mid-query truncation caveat (shared with every log-backed scan): the
  * count is plan-time-consistent. A broker truncating between planning
  * and execution would fail or shrink a ROW read at fetch time, while the
  * count — resolved wholly at plan time — keeps the planned answer. Both
  * behaviors answer "as of plan time" for data that was readable then.
  */
class GraftMqCountBatch(opts: GraftMqOptions, countCols: Int) extends Batch {

  // The minimal schema keeps the delegate's construction trivially cheap;
  // plannedRanges never touches payload fields.
  private val total: Long =
    new GraftMqBatch(opts, GraftMqOptions.minimalSchema).plannedRanges
      .valuesIterator.map { case (s, e) => math.max(0L, e - s) }.sum

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftMqCountPartition(total, countCols))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftMqCountReaderFactory
}

/** One pre-summed row: `total` repeated in each pushed count column
  * (several `count(*)` projections in one query all carry the same
  * value).
  */
final case class GraftMqCountPartition(total: Long, countCols: Int)
    extends InputPartition

class GraftMqCountReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val cp = p.asInstanceOf[GraftMqCountPartition]
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow =
        InternalRow.fromSeq(Seq.fill(cp.countCols)(cp.total))
      override def close(): Unit = ()
    }
}
