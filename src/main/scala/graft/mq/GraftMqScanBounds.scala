package graft.mq

import org.apache.spark.sql.sources._

/** Offset-range bounds derived from pushed-down filters on the metadata
  * columns (`partition`, `offset`, `timestamp`) — the DSv2 pushdown the
  * reference names as a core DataSource-V2 motivation
  * (/root/reference/README.md:152, 751) but leaves unimplemented.
  *
  * Pruning is a SEEK optimization, never an evaluation: every pushed
  * filter is also returned to Spark as a residual, so values are
  * re-checked post-scan. That makes the translation safe under the weak
  * guarantees an MQ gives:
  *  - `partition`/`offset` bounds are exact (offsets are the scan
  *    coordinates themselves);
  *  - `timestamp` LOWER bounds seek via first-offset-at-timestamp, which
  *    is a superset for any log (no record before the first
  *    `ts >= X` index can satisfy `ts >= X`);
  *  - timestamp UPPER bounds are NOT pruned: with producer-supplied
  *    (CreateTime-style, possibly non-monotonic) timestamps, records
  *    after the first `ts >= X` index may still satisfy `ts < X`, so an
  *    upper seek could drop qualifying rows. They stay residual-only.
  */
final case class GraftMqScanBounds(
    partitions: Option[Set[Int]] = None,
    minOffset: Option[Long] = None, // inclusive
    maxOffsetExclusive: Option[Long] = None,
    minTimestampMicros: Option[Long] = None) {

  def isEmpty: Boolean = this == GraftMqScanBounds()

  private def narrowed(a: Option[Long], b: Option[Long], pick: (Long, Long) => Long) =
    (a ++ b).reduceOption(pick)

  def and(o: GraftMqScanBounds): GraftMqScanBounds = GraftMqScanBounds(
    partitions = (partitions, o.partitions) match {
      case (Some(x), Some(y)) => Some(x intersect y)
      case (x, y) => x.orElse(y)
    },
    minOffset = narrowed(minOffset, o.minOffset, math.max),
    maxOffsetExclusive = narrowed(maxOffsetExclusive, o.maxOffsetExclusive, math.min),
    minTimestampMicros = narrowed(minTimestampMicros, o.minTimestampMicros, math.max))
}

object GraftMqScanBounds {

  private def longOf(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  private def microsOf(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos % 1000000) / 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _ => None
  }

  /** The single-filter translation; None = not prunable (stays residual
    * without contributing a seek).
    */
  def of(f: Filter): Option[GraftMqScanBounds] = f match {
    case EqualTo("partition", v) =>
      longOf(v).map(p => GraftMqScanBounds(partitions = Some(Set(p.toInt))))
    case In("partition", vs) =>
      val ps = vs.toSeq.flatMap(longOf).map(_.toInt)
      if (ps.size == vs.length) Some(GraftMqScanBounds(partitions = Some(ps.toSet)))
      else None
    // o + 1 at Long.MaxValue would wrap to Long.MinValue: as an EXCLUSIVE
    // upper bound that prunes EVERYTHING — fabricating emptiness, the one
    // thing a seek must never do. MaxValue bounds are tautological (no
    // offset exceeds it), so they contribute no seek and stay residual.
    case EqualTo("offset", v) =>
      longOf(v).map(o => GraftMqScanBounds(minOffset = Some(o),
        maxOffsetExclusive = if (o == Long.MaxValue) None else Some(o + 1)))
    case GreaterThan("offset", v) =>
      longOf(v).filter(_ != Long.MaxValue).map(o => GraftMqScanBounds(minOffset = Some(o + 1)))
    case GreaterThanOrEqual("offset", v) => longOf(v).map(o => GraftMqScanBounds(minOffset = Some(o)))
    case LessThan("offset", v) => longOf(v).map(o => GraftMqScanBounds(maxOffsetExclusive = Some(o)))
    case LessThanOrEqual("offset", v) =>
      longOf(v).map(o => GraftMqScanBounds(
        maxOffsetExclusive = if (o == Long.MaxValue) None else Some(o + 1)))
    case GreaterThan("timestamp", v) =>
      microsOf(v).map(ts => GraftMqScanBounds(minTimestampMicros = Some(ts)))
    case GreaterThanOrEqual("timestamp", v) =>
      microsOf(v).map(ts => GraftMqScanBounds(minTimestampMicros = Some(ts)))
    case EqualTo("timestamp", v) =>
      microsOf(v).map(ts => GraftMqScanBounds(minTimestampMicros = Some(ts)))
    case _ => None
  }

  def prunable(f: Filter): Boolean = of(f).isDefined

  def from(filters: Seq[Filter]): GraftMqScanBounds =
    filters.flatMap(of).foldLeft(GraftMqScanBounds())(_ and _)
}
