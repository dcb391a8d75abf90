package graft.tools

import graft.SparkSuite

/** Wires the duplicate-multiplicity probe into `sbt test` at a small
  * factor: the expansion-algebra assertions (pair fan-out = factor²,
  * within cliques, component/keep-set mapping identity, pack prefix sum)
  * are scale-independent, so a factor-3 run over sf0.001 exercises the
  * identical check code the 10×/100× CLI runs use — a regression that
  * makes candidate generation quadratic in multiplicity, drops within
  * pairs, or breaks the collapse expansion fails HERE, not in a hand
  * probe four rounds later. The wall-time ceiling is CLI-only (sub-second
  * bases are job-overhead noise).
  */
class ScaleProbeSpec extends SparkSuite {

  test("factor-3 replication probe: pair/CC/keep/pack expansion algebra holds") {
    val factor = 3
    val repDir = tmp("graft-probe") + "/rep"
    ScaleProbe.replicateDir(spark, sf(), repDir, factor)
    // One query per check kind keeps the suite fast while covering every
    // assertion path; the CLI default list runs all nine.
    val queries = ScaleProbe.defaultQueries.filter { case (n, _) =>
      Set("dedup_jaccard_exact", "dedup_simhash_pairs", "dedup_embedding_pairs",
        "dedup_components", "curate_near_dup", "pipeline_pack_shards")(n)
    }
    val results = ScaleProbe.run(spark, sf(), repDir, factor, queries,
      timeCeiling = None)
    assert(results.size == queries.size)
    val failed = results.filter(!_.ok)
    assert(failed.isEmpty, failed.map(r => s"${r.query}: ${r.failures.mkString("; ")}")
      .mkString(" | "))
    // The replication itself did what the algebra assumes: factor x rows.
    val base = spark.read.parquet(s"${sf()}/documents.parquet").count()
    assert(spark.read.parquet(s"$repDir/documents.parquet").count() == base * factor)
  }
}
