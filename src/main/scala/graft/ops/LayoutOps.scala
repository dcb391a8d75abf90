package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output layout for pipeline results — at 100 TB the WRITE side decides
  * the read performance of every downstream consumer (a training job
  * reading one language, one date, one source shouldn't scan the rest).
  *
  * Two layouts:
  *  - hive-partitioned (`partitionBy`): low-cardinality selector columns
  *    become directories; readers get partition PRUNING (directories never
  *    listed) rather than row-group skipping.
  *  - range-sharded: `repartitionByRange` + `sortWithinPartitions` on a
  *    high-cardinality key → each file covers a tight key range, so
  *    min/max footer stats skip whole files on key-range predicates
  *    (the poor man's clustering index; same mechanics Z-ordering
  *    generalizes to multiple dimensions).
  *
  * `maxRecordsPerFile` bounds file sizes in both layouts — hot partitions
  * split instead of producing one giant file (small-file storms are the
  * other failure mode; choose the bound ≈ target_file_bytes / row_width).
  */
object LayoutOps {

  /** Hive-partitioned parquet: one directory tree level per column in
    * `partitionCols` (order = nesting order; keep cardinality low and
    * leading columns most-filtered).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 0L): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned: no partition columns")
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Range-sharded parquet: `shards` files, each covering a contiguous
    * `sortCol` range, rows sorted within — footer min/max then prune
    * whole files for range predicates on `sortCol`.
    */
  def writeRangeSharded(df: DataFrame, path: String, sortCol: String,
      shards: Int, maxRecordsPerFile: Long = 0L): Unit = {
    require(shards > 0, s"writeRangeSharded: shards must be positive, got $shards")
    df.repartitionByRange(shards, df(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }
}
