package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** SpaceSaving (Metwally et al., "Efficient Computation of Frequent and
  * Top-k Elements in Data Streams") heavy-hitters state: at most `capacity`
  * counters; when full, the minimum counter is evicted and the newcomer
  * inherits `min+1` with error `min`. Guarantees: true count ∈
  * [count - error, count]; any item with frequency > N/capacity is
  * retained. When `capacity` ≥ distinct items the counts are EXACT
  * (error 0) — which is what makes the operator oracle-checkable at test
  * scale while staying a fixed-memory sketch at 100 TB.
  */
final class SpaceSavingBuffer(val capacity: Int) {
  // item -> (count, error)
  val counters: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
  // (count, item) ordered index over the same entries: min-eviction and
  // count updates are O(log capacity) instead of a full minBy scan per
  // insertion — with a high-cardinality stream near-every row evicts, so
  // the O(capacity) scan made the update path O(N·capacity). Ordering by
  // (count, item) preserves the deterministic lexicographic tie-break.
  private val byCount = mutable.TreeSet.empty[(Long, String)]

  def add(item: String, weight: Long = 1L): Unit = {
    counters.get(item) match {
      case Some((c, e)) =>
        byCount.remove((c, item))
        counters.update(item, (c + weight, e))
        byCount.add((c + weight, item))
      case None if counters.size < capacity =>
        counters.update(item, (weight, 0L))
        byCount.add((weight, item))
      case None =>
        // Evict the global minimum (ties: lexicographically smallest item,
        // for cross-run determinism).
        val min @ (minC, minItem) = byCount.head
        byCount.remove(min)
        counters.remove(minItem)
        counters.update(item, (minC + weight, minC))
        byCount.add((minC + weight, item))
    }
  }

  /** Restore one entry verbatim (deserialization path). Removes any
    * existing index tuple first so a repeated item can never leave a
    * stale (count, item) entry corrupting eviction order — callers today
    * only restore into fresh buffers, but the invariant shouldn't depend
    * on that.
    */
  def restore(item: String, count: Long, error: Long): Unit = {
    counters.get(item).foreach { case (c, _) => byCount.remove((c, item)) }
    counters.update(item, (count, error))
    byCount.add((count, item))
  }

  def mergeIn(other: SpaceSavingBuffer): Unit = {
    // Mergeable-summaries SpaceSaving merge (Agarwal et al.): an item
    // ABSENT from a full summary may still have occurred up to that
    // summary's minimum count times (it could have been evicted), so
    // absent items are charged (min, min) — otherwise a merged count
    // could undercount the true frequency and break the
    // `true <= count <= true + error` guarantee. Then shrink to capacity.
    def minOf(b: SpaceSavingBuffer): Long =
      if (b.counters.size < b.capacity) 0L else b.byCount.head._1
    val minSelf = minOf(this)
    val minOther = minOf(other)
    val keys = counters.keySet ++ other.counters.keySet
    val merged = keys.iterator.map { k =>
      val (c1, e1) = counters.getOrElse(k, (minSelf, minSelf))
      val (c2, e2) = other.counters.getOrElse(k, (minOther, minOther))
      k -> (c1 + c2, e1 + e2)
    }.toMap
    counters.clear()
    byCount.clear()
    merged.foreach { case (k, (c, e)) => restore(k, c, e) }
    while (counters.size > capacity) {
      val min @ (_, minItem) = byCount.head
      byCount.remove(min)
      counters.remove(minItem)
    }
  }
}

/** approx_top_k(expr, k, capacity) → array<struct<item,string count:long,error:long>>
  * — top-k heavy hitters ordered by (count desc, item asc).
  */
case class ApproxTopK(child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer]
    with ExpectsInputTypes with UnaryLike[Expression] {

  require(k > 0 && capacity >= k, "approx_top_k: need capacity >= k > 0")

  override def prettyName: String = "approx_top_k"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("error", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer,
      other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: SpaceSavingBuffer): Any = {
    val top = buffer.counters.toSeq
      .sortBy { case (item, (c, _)) => (-c, item) }
      .take(k)
      .map { case (item, (c, e)) =>
        InternalRow(UTF8String.fromString(item), c, e)
      }
    new GenericArrayData(top)
  }

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.counters.size)
    buffer.counters.foreach { case (item, (c, e)) =>
      // Length-prefixed raw UTF-8, NOT writeUTF: writeUTF throws
      // UTFDataFormatException past 64 KB, and this aggregates arbitrary
      // StringType values (a >64 KB document would fail the whole query
      // at partial-buffer shuffle time).
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(capacity)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val item = new String(b, "UTF-8")
      val c = in.readLong(); val e = in.readLong()
      buf.restore(item, c, e)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): ApproxTopK =
    copy(child = c)
}
