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
    // assertion path; the CLI default list runs the full set.
    val queries = ScaleProbe.defaultQueries.filter { case (n, _) =>
      Set("dedup_jaccard_exact", "dedup_simhash_pairs", "dedup_embedding_pairs",
        "dedup_components", "curate_near_dup", "curate_incremental_dedup",
        "curate_incremental_append", // VerdictKind through the append path
        "sample_temperature", // TemperatureKind: closed-form re-derivation
        "text_paragraph_dedup", "text_dup_spans", "text_substring_dedup",
        "stats_cms_freq", // ScaledCountsKind: CMS counter-sum conservation
        "curate_c4_rules", // RowInvariantKind: per-row verdict unanimity
        "dedup_overlap_pairs", // PairsKind through the containment score
        "pipeline_pack_shards")(n)
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

  test("factor-3 skewed probe: distinct same-bucket replicas — guard active, ID algebra holds") {
    // The skewed profile is the regime plain replication cannot see:
    // replicas are DISTINCT vectors (scaled 1 + k·1e-6, signs preserved),
    // so duplicate collapse cannot shrink the band buckets and the
    // hot-bucket grid split is what carries the within-bucket work. The
    // tiny forced thresholds make buckets hot at sf0.001 scale.
    val factor = 3
    val repDir = tmp("graft-probe-skew") + "/rep"
    ScaleProbe.replicateDir(spark, sf(), repDir, factor, perturbEmbeddings = true)
    // Perturbed replicas really are distinct vector VALUES (collapse sees
    // factor× distinct rows, not one class).
    val distinctVecs = spark.read.parquet(s"$repDir/embeddings.parquet")
      .select("embedding").distinct().count()
    val baseVecs = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select("embedding").distinct().count()
    assert(distinctVecs > baseVecs * (factor - 1),
      s"perturbation failed to make replicas distinct: $distinctVecs vs base $baseVecs")
    val r = ScaleProbe.runSkew(spark, sf(), repDir, factor,
      hotBucketThreshold = 4L, splitTarget = 4L)
    assert(r.ok, r.failures.mkString("; "))
    assert(r.repRows > r.baseRows, "skewed run should add the within cliques")
  }

  test("factor-3 disjoint-vocabulary probe: BM25 top-k invariant, zero contamination") {
    val factor = 3
    val repDir = tmp("graft-probe-bm25") + "/rep"
    ScaleProbe.replicateDir(spark, sf(), repDir, factor, perturbDocuments = true)
    // The perturbation really is vocabulary-disjoint: base tokens and
    // k>0 replica tokens share nothing (the suffix is on every token).
    val r = ScaleProbe.runBm25(spark, sf(), repDir, factor, k = 5)
    assert(r.ok, r.failures.mkString("; "))
    assert(r.baseRows > 0 && r.baseRows == r.repRows,
      s"bm25 probe returned base=${r.baseRows} rep=${r.repRows} rows")
  }

  test("semdedup nlist sizing probe: larger nlist strictly shrinks the pair budget") {
    // The cost-law evidence behind semdedupKeepSet's √N default: the
    // within-cluster comparison budget Σ C(|c|, 2) must fall as nlist
    // grows — a fixed nlist is what does NOT scale.
    val r = ScaleProbe.runSemDedupSizing(spark, sf(), nlistLo = 4, nlistHi = 16)
    assert(r.ok, r.failures.mkString("; "))
    assert(r.baseRows > 0, "probe corpus produced an empty pair budget")
  }
}
