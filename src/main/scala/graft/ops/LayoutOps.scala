package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

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

  /** Token-budget shard assignment: documents ordered by `keyCol` are laid
    * out as one contiguous token stream, and each doc's shard is its
    * global token OFFSET divided by `budget` — exactly how a training
    * pipeline maps a deterministic document order onto fixed-token-budget
    * shards. Returns (key, weight, token_offset, shard_id), where
    * `token_offset` = sum of weights of all earlier keys.
    *
    * Semantically this is `sum(weight) OVER (ORDER BY key ROWS UNBOUNDED
    * PRECEDING)` — but a GLOBAL ordered window is a single-reducer plan,
    * the one shape that cannot scale. Shipped instead as the classic
    * distributed prefix sum: range-partition by key and sort within
    * partitions (each partition = a contiguous key span), aggregate one
    * tiny per-partition total (P rows to the driver — the scan stays
    * distributed), scan-left those totals into per-partition start
    * offsets, then a single stateless pass adds each partition's offset
    * to its running sum. Output values are independent of P (offsets
    * depend only on the global key order), which the spec asserts.
    *
    * @param keyCol    unique numeric orderBy key (castable to long);
    *                  uniqueness is ENFORCED (duplicates throw) because a
    *                  duplicate would make tie order — and every later
    *                  offset — nondeterministic
    * @param weightCol non-negative token count (null → 0)
    */
  def packByTokenBudget(df: DataFrame, keyCol: String, weightCol: String,
      budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"packByTokenBudget: budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // localCheckpoint pins the partition layout: both the totals pass and
    // the offset pass must see identical partition ids.
    val ranged = df
      .select(col(keyCol).cast("long").as("k"),
        coalesce(col(weightCol).cast("long"), lit(0L)).as("w"))
      .repartitionByRange(parts, col("k"))
      .sortWithinPartitions("k")
      .localCheckpoint(true)
    // min(w) and the key-uniqueness check ride along the totals pass for
    // free: a negative weight (bad tokenizer sentinel) would silently
    // corrupt every later offset, and a DUPLICATE key makes the
    // within-partition sort order among its rows arbitrary — offsets for
    // the tied rows would be run-to-run nondeterministic and silently
    // diverge from the single-reducer oracle. Both are contract
    // violations; both fail loudly. (Range partitioning co-locates equal
    // keys, so per-partition distinctness is global distinctness.)
    // countDistinct ignores NULLs, so null keys are counted separately:
    // without the explicit null count, a single (unique) null key would be
    // misreported as a duplicate — and it would anyway fail the typed
    // decode below with an opaque error. Null keys violate the "numeric
    // orderBy key" contract outright; say so.
    val stats = ranged.groupBy(spark_partition_id().as("pid"))
      .agg(sum(col("w")).as("t"), min(col("w")).as("mn"),
        count(lit(1)).as("n"), countDistinct(col("k")).as("nd"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("nn"))
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    stats.find(_._3 < 0).foreach { case (_, _, mn, _, _, _) =>
      throw new IllegalArgumentException(
        s"packByTokenBudget: negative weight $mn in '$weightCol' — token counts must be >= 0")
    }
    stats.find(_._6 > 0).foreach { case (_, _, _, _, _, nn) =>
      throw new IllegalArgumentException(
        s"packByTokenBudget: '$keyCol' has $nn null key row(s) — the orderBy key must be " +
          "non-null (a null key has no position in the global key order)")
    }
    stats.find(s => s._4 != s._5).foreach { case (_, _, _, n, nd, _) =>
      throw new IllegalArgumentException(
        s"packByTokenBudget: '$keyCol' must be unique — found ${n - nd} duplicate key row(s); " +
          "duplicate keys make tie order, and therefore offsets, nondeterministic")
    }
    val totals = stats.map { case (pid, t, _, _, _, _) => pid -> t }.toMap
    val starts = (0 until parts).scanLeft(0L)((acc, pid) =>
      acc + totals.getOrElse(pid, 0L))
    val startsB = spark.sparkContext.broadcast(starts.toArray)
    val b = budget
    ranged.as[(Long, Long)].mapPartitions { it =>
      var acc = startsB.value(org.apache.spark.TaskContext.getPartitionId())
      it.map { case (k, w) =>
        val off = acc
        acc += w
        (k, w, off, off / b)
      }
    }.toDF(keyCol, weightCol, "token_offset", "shard_id")
  }
}
