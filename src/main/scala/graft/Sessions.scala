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
      // NO global initialPartitionNum bump (r18, second thoughts): an
      // 8×-cores AQE initial reducer count shipped briefly to
      // memory-bound the sf10 jaccard aggs, but the proper fix — the
      // VOLUME-SIZED explicit repartitions inside the heavy pair ops,
      // committed the same evening — superseded it where it mattered,
      // while the blunt global knob taxed every small stage: an
      // isolated A-B-A at sf0.1 measured UNTOUCHED queries ~2× slower
      // under it (sample_temperature 0.73 → 1.68 s warm; the whole
      // 125-query common set 87 → 115 s) because each tiny exchange
      // pays 256-bucket shuffle writes plus AQE re-planning before
      // coalescing back down. Corpus-sized stages that need more
      // reducers than `cpus` must size themselves to their data (the
      // explodedJoinPartitions pattern) — the same discipline a real
      // cluster job needs, so nothing is lost at 100 TB by keeping the
      // session default lean.
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
