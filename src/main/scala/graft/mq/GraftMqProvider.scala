package graft.mq

import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
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
    new GraftMqTable(GraftMqOptions.from(properties))

  override def supportsExternalMetadata(): Boolean = false
}

/** The MQ topic as an unbounded table — reference CustomTable
  * (/root/reference/src/main/java/org/example/CustomTable.java:19-55), plus
  * the batch-read and write capabilities the reference spec names but does
  * not implement (README.md:250-259, 268-278; mock write-throws at
  * CustomTable.java:52-54).
  */
class GraftMqTable(opts: GraftMqOptions) extends Table
    with SupportsRead with SupportsWrite {

  override def name(): String = s"graft-mq:${opts.topic}"

  override def schema(): StructType = opts.schema

  override def capabilities(): util.Set[TableCapability] = Set(
    TableCapability.MICRO_BATCH_READ,
    TableCapability.BATCH_READ,
    TableCapability.STREAMING_WRITE,
    TableCapability.BATCH_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // Read options may refine table options (e.g. maxRowsPerBatch per query).
    new GraftMqScanBuilder(GraftMqOptions.from(options.asCaseSensitiveMap()))

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
    with SupportsPushDownRequiredColumns {
  private var pruned: StructType = opts.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    pruned = requiredSchema

  override def build(): Scan = new GraftMqScan(opts, pruned)
}

/** Scan bridging to both execution modes. `readSchema` returns the real
  * (possibly pruned) schema — the reference returns `null`
  * (CustomScan.java:19-21, defect SURVEY.md §2.9-2).
  */
class GraftMqScan(opts: GraftMqOptions, readSchemaValue: StructType) extends Scan {
  override def readSchema(): StructType = readSchemaValue

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMqMicroBatchStream(opts, checkpointLocation, readSchemaValue)

  override def toBatch: Batch = new GraftMqBatch(opts, readSchemaValue)

  override def description(): String =
    s"graft-mq topic=${opts.topic} backend=${opts.backend} partitions=${opts.numPartitions}"
}
