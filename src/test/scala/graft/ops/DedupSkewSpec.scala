package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hot-bucket skew guard ([[DedupOps.selfJoinWithinBuckets]]): the banded
  * LSH self-joins are quadratic WITHIN a bucket, and a popular bucket of
  * DISTINCT members (anisotropic real embeddings — e.g. the all-positive
  * sign orthant) is the one scale-killer duplicate collapse cannot touch,
  * and the replication probe cannot see (replicated vectors collapse).
  * These specs pin: (1) the grid split covers exactly the bucket pair
  * space, (2) guarded operators are byte-identical to their unguarded
  * form on an adversarial skewed fixture and on real data with the guard
  * forced onto EVERY bucket.
  */
class DedupSkewSpec extends SparkSuite {

  test("selfJoinWithinBuckets: grid split covers exactly the bucket pair space") {
    import spark.implicits._
    // One 60-member bucket of DISTINCT ids + one cold 3-member bucket.
    val banded = ((1L to 60L).map(i => (i, 0, "hot", s"p$i")) ++
        Seq((101L, 0, "cold", "c1"), (102L, 0, "cold", "c2"), (103L, 0, "cold", "c3")))
      .toDF("id", "band", "bkey", "payload")
    def run(hot: Long, split: Long) =
      DedupOps.selfJoinWithinBuckets(banded, Seq("band", "bkey"), Seq("payload"),
        hotBucketThreshold = hot, splitTarget = split)
    val guarded = run(8L, 7L)
    val unguarded = run(1000000L, 7L)
    // Hot path engaged: same-group blocks emit both orientations, so the
    // RAW row count exceeds the exact pair count; the cold-only path is
    // exactly the pair count.
    val exactPairs = 60L * 59 / 2 + 3L
    assert(unguarded.count() == exactPairs)
    assert(guarded.count() > exactPairs,
      "hot path not engaged — raw grid output should double same-group pairs")
    // ... and after distinct, both paths produce the identical pair set
    // with identically-oriented carry columns.
    val g = guarded.distinct().orderBy("id_a", "id_b")
      .as[(Long, Long, String, String)].collect().toSeq
    val u = unguarded.distinct().orderBy("id_a", "id_b")
      .as[(Long, Long, String, String)].collect().toSeq
    assert(g == u)
    assert(g.size == exactPairs)
    assert(g.forall { case (a, b, pa, pb) =>
      a < b && pa == (if (a > 100) s"c${a - 100}" else s"p$a") &&
        pb == (if (b > 100) s"c${b - 100}" else s"p$b") })
    // The split actually divides the bucket: sub-group sizes are all well
    // under the bucket size, so no block exceeds ~(maxGroup)^2 pairs.
    val s = math.ceil(60.0 / 7.0).toInt
    val groupSizes = banded.filter(col("bkey") === "hot")
      .groupBy(pmod(xxhash64(col("id")), lit(s))).count()
      .as[(Long, Long)].collect().map(_._2)
    assert(groupSizes.length > 1 && groupSizes.max < 60,
      s"expected the bucket spread over sub-groups, got ${groupSizes.toSeq}")
  }

  test("embeddingNearDupPairs: adversarial one-orthant fixture — guarded == brute force") {
    import spark.implicits._
    // 180 DISTINCT all-positive vectors: every row lands in the SAME sign
    // bucket of every band, so the band join is one 180-member hot bucket
    // per band that collapse cannot shrink. Plus 10 exact duplicates to
    // exercise the guard × collapse interplay.
    val rnd = new scala.util.Random(7)
    val base = (0 until 180).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() + 0.01f))
    }
    val rows = base ++ (0 until 10).map(i => (1000L + i, base(i)._2))
    val emb = rows.toDF("vec_id", "embedding")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b", "cosine")
        .as[(Long, Long, Double)].collect().toSeq.sorted
    val brute = key(DedupOps.embeddingNearDupPairsBrute(emb, threshold = 0.9))
    val guarded = key(DedupOps.embeddingNearDupPairs(emb, threshold = 0.9, dims = 64,
      hotBucketThreshold = 16L, splitTarget = 8L))
    val default = key(DedupOps.embeddingNearDupPairs(emb, threshold = 0.9, dims = 64))
    assert(brute.nonEmpty, "fixture should produce near-dup pairs")
    assert(guarded == brute, s"guarded diverged: ${guarded.take(3)} vs ${brute.take(3)}")
    assert(default == brute)
  }

  test("simhash/minhash pairs: guard forced onto every bucket == default result") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(DedupOps.simhashPairs(docs, hotBucketThreshold = 1L, splitTarget = 2L))
      == rows(DedupOps.simhashPairs(docs)))
    assert(rows(DedupOps.minhashLshPairs(docs, hotBucketThreshold = 1L, splitTarget = 2L))
      == rows(DedupOps.minhashLshPairs(docs)))
  }
}
