package graft.mq

import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/** `graft-mq` DataSource V2 entry point.
  *
  * Spark-native rebuild of the reference's CustomTableProvider
  * (/root/reference/src/main/java/org/example/CustomTableProvider.java:12-24),
  * with the two defects fixed (SURVEY.md §2.9): the schema is actually
  * declared (the reference discards `StructType.add`'s return value), and a
  * `DataSourceRegister.shortName` is provided so
  * `spark.readStream.format("graft-mq")` resolves without an FQCN.
  */
class GraftMqProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mq"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftMqOptions.from(options.asCaseSensitiveMap()).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftMqTable(GraftMqOptions.from(properties), properties)

  override def supportsExternalMetadata(): Boolean = false
}

/** The MQ topic as an unbounded table — reference CustomTable
  * (/root/reference/src/main/java/org/example/CustomTable.java:19-55), plus
  * the batch-read and write capabilities the reference spec names but does
  * not implement (README.md:250-259, 268-278; mock write-throws at
  * CustomTable.java:52-54).
  */
class GraftMqTable(opts: GraftMqOptions,
    tableProperties: util.Map[String, String]) extends Table
    with SupportsRead with SupportsWrite {

  def this(opts: GraftMqOptions) = this(opts, new util.HashMap[String, String]())

  override def name(): String = s"graft-mq:${opts.topic}"

  override def schema(): StructType = opts.schema

  // ACCEPT_ANY_SCHEMA (as Kafka's sink declares): the write schema is
  // value [+ key, timestamp] — not the table's READ schema — so without
  // it Spark's output resolution rejects any batch write carrying the
  // documented optional columns ("too many data columns") before the
  // writer runs. The writer itself validates what it receives.
  override def capabilities(): util.Set[TableCapability] = Set(
    TableCapability.MICRO_BATCH_READ,
    TableCapability.BATCH_READ,
    TableCapability.STREAMING_WRITE,
    TableCapability.BATCH_WRITE,
    TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // Table-level properties are the base; per-scan read options refine
    // them (e.g. maxRowsPerBatch per query). Today Spark passes the full
    // merged option set as scan options, but a catalog integration would
    // not — merging here keeps that future path correct. Keys are
    // lower-cased on BOTH sides before merging: options are
    // case-insensitive, so a per-scan override spelled with different
    // casing must still replace the table-level entry rather than
    // coexisting with it (and then winning or losing by HashMap iteration
    // order inside GraftMqOptions.from).
    val merged = new util.HashMap[String, String]()
    tableProperties.forEach((k, v) => merged.put(k.toLowerCase(java.util.Locale.ROOT), v))
    options.asCaseSensitiveMap()
      .forEach((k, v) => merged.put(k.toLowerCase(java.util.Locale.ROOT), v))
    new GraftMqScanBuilder(GraftMqOptions.from(merged))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftMqWriteBuilder(GraftMqOptions.from(info.options().asCaseSensitiveMap()),
      info.schema())
}

/** Column pruning (`SupportsPushDownRequiredColumns`): a query that only
  * touches e.g. (partition, offset) must not materialize payload bytes —
  * at 100 TB the payload IS the data volume, so pruning at the source is
  * the difference between a metadata scan and a full read. The engine
  * hands us the required subset; the reader then builds rows with exactly
  * those fields (SURVEY.md §4 "column pruning" row).
  */
class GraftMqScanBuilder(opts: GraftMqOptions) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownAggregates {
  private var pruned: StructType = opts.schema
  private var pushed: Array[Filter] = Array.empty
  private var anyFilters: Boolean = false
  private var bounds: GraftMqScanBounds = GraftMqScanBounds()
  private var limit: Option[Int] = None
  private var countStarCols: Int = 0

  override def pruneColumns(requiredSchema: StructType): Unit =
    // After an aggregate pushdown the output schema is the aggregation's
    // own (fixed in pushAggregation); the engine's subsequent prune call
    // carries that same schema and must not re-widen to message fields.
    if (countStarCols == 0) pruned = requiredSchema

  /** Filter pushdown as offset-range SEEKS (see [[GraftMqScanBounds]]):
    * `partition`/`offset` bounds and `timestamp` lower bounds narrow the
    * planned ranges; every filter is ALSO returned as residual so Spark
    * re-verifies values — pruning can only skip data, never fabricate it.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    anyFilters = filters.nonEmpty
    pushed = filters.filter(GraftMqScanBounds.prunable)
    bounds = GraftMqScanBounds.from(pushed.toSeq)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** LIMIT pushdown caps planned rows. Spark only offers a limit when no
    * post-scan filter remains; since this builder keeps every filter
    * residual, that means no filters at all — guarded anyway, against ALL
    * pushed filters (not just the prunable subset: capping rows under a
    * residual non-prunable filter would return fewer matches than exist).
    */
  override def pushLimit(l: Int): Boolean =
    if (!anyFilters) { limit = Some(l); true } else false

  /** COUNT(*) pushdown: a batch `count(*)` over an MQ topic is pure offset
    * arithmetic — Σ (until − from) over the SAME resolved ranges the row
    * scan would read ([[GraftMqCountBatch]]) — so it is answered with ZERO
    * message fetches: at 100 TB, counting a topic costs a metadata lookup
    * instead of a full log read. COMPLETE pushdown (the scan emits the one
    * final row) — correct because the count batch plans exactly one
    * partition holding the pre-summed total.
    *
    * Accepted only when the count is exactly offset arithmetic:
    *  - no filters AT ALL (this builder keeps every filter residual, so
    *    the engine skips aggregate pushdown itself whenever one exists —
    *    guarded here anyway against engine-behavior drift);
    *  - no GROUP BY (grouping needs message fields);
    *  - CountStar only: `count(col)` skips nulls, which requires reading
    *    values (message fields are non-null by schema, but equating the
    *    two here would silently break if a nullable column ever lands).
    */
  private def countable(agg: Aggregation): Boolean =
    opts.aggregatePushdown && !anyFilters && limit.isEmpty &&
      agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(_.isInstanceOf[CountStar])

  override def supportCompletePushDown(agg: Aggregation): Boolean = countable(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    if (!countable(agg)) false
    else {
      countStarCols = agg.aggregateExpressions.length
      pruned = StructType((0 until countStarCols).map(i =>
        StructField(if (i == 0) "count(*)" else s"count(*)_$i",
          LongType, nullable = false)))
      true
    }

  override def build(): Scan =
    new GraftMqScan(opts, pruned, bounds, limit, countStarCols)
}

/** Scan bridging to both execution modes. `readSchema` returns the real
  * (possibly pruned) schema — the reference returns `null`
  * (CustomScan.java:19-21, defect SURVEY.md §2.9-2).
  */
class GraftMqScan(opts: GraftMqOptions, readSchemaValue: StructType,
    bounds: GraftMqScanBounds = GraftMqScanBounds(),
    limit: Option[Int] = None,
    countStarCols: Int = 0) extends Scan {
  override def readSchema(): StructType = readSchemaValue

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // Aggregate pushdown is a batch-plan rewrite; the engine never routes
    // a streaming relation through it. Defensive, not reachable.
    require(countStarCols == 0,
      "graft-mq: pushed-down count(*) is batch-only")
    // Kafka parity: endingOffsets bounds batch scans only; accepting it on
    // a stream would silently read unbounded (ADVICE r03).
    require(opts.endingOffsets == "latest",
      "graft-mq: endingOffsets is not supported for streaming reads")
    // Offset/partition bounds are not applied to streaming progress (the
    // offset log governs it); pushed filters remain residual and are
    // applied by the engine per micro-batch. A pushed timestamp LOWER
    // bound, though, legitimately tightens the FIRST-start resolution
    // (Kafka's startingTimestamp equivalent): rows before
    // first-offset-at-timestamp can never pass the residual filter, so
    // batch 0 seeks past them instead of reading and discarding. Restarts
    // are untouched — they resume from the checkpointed offset log.
    new GraftMqMicroBatchStream(opts, checkpointLocation, readSchemaValue,
      GraftMqScanBounds(minTimestampMicros = bounds.minTimestampMicros))
  }

  override def toBatch: Batch =
    if (countStarCols > 0) new GraftMqCountBatch(opts, countStarCols)
    else new GraftMqBatch(opts, readSchemaValue, bounds, limit)

  override def description(): String =
    s"graft-mq topic=${opts.topic} backend=${opts.backend} partitions=${opts.numPartitions}" +
      (if (bounds.isEmpty) "" else s" seek=$bounds") +
      limit.map(l => s" limit=$l").getOrElse("") +
      (if (countStarCols > 0) s" countStar=$countStarCols" else "")
}
