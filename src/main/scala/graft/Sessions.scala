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
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
