package graft

import org.apache.spark.sql.SparkSession

/** The ONE local-session recipe shared by every main-source entry point
  * (Verify, Bench, TimeQuery, ScaleProbe, ExplainDump). Round 11's UTC
  * retrofit showed the drift cost of copy-pasted builder blocks: a
  * config fix that lands in one entry point and not the others makes
  * tools disagree with the correctness gate (the session-timezone-
  * dependent events normalization timed tz-shifted plans in Bench while
  * Verify was correct). Config semantics:
  *  - `shuffle.partitions` / `files.minPartitionNum` = cpus: shuffles
  *    and single-file scans split across exactly the local cores;
  *  - `session.timeZone` UTC: matches DuckDB's naive-as-UTC reading of
  *    the events table (normalizeTsNanos contract);
  *  - `nanosAsLong`: events.parquet stores TIMESTAMP(NANOS), which
  *    Spark 4 only reads as long nanos.
  */
object Sessions {
  def local(cpus: String): SparkSession = {
    val n = cpus.toIntOption.getOrElse(32)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Scale-adaptive reducer count (r18 — found by ShuffleAudit):
      // with exactly `cpus` reducers, a reduce-side hash aggregate over
      // a corpus-sized stream outgrows its per-task memory as SF rises —
      // dedup_jaccard_exact's intersection-count agg spilled 4.9 GB at
      // sf10 and its MAP-side partial agg degraded to passthrough (18×
      // shuffle bytes for 10× rows). AQE plans big stages at 8× the
      // core count and coalesces small ones back down to ~64 MB targets,
      // so tiny stages pay nothing while corpus-sized aggs get
      // memory-bounded tasks — the local analogue of sizing
      // shuffle.partitions to the data on a real cluster.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (n * 8).toString)
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
