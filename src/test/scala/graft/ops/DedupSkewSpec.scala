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

  test("joinAcrossBuckets: bipartite grid covers the cross pair space exactly once") {
    import spark.implicits._
    // One hot bucket (40 × 60 distinct members) + one cold bucket on the
    // plain-join path; every cross pair must appear EXACTLY once (the
    // bipartite grid assigns each pair to one (gA, gB) block — no
    // duplicate-emitting same-group case like the triangular self-join).
    val a = ((0L until 40L).map(i => (i, 0, "hot")) ++
        Seq((90L, 0, "cold"), (91L, 0, "cold"))).toDF("id", "band", "bkey")
    val b = ((100L until 160L).map(i => (i, 0, "hot")) ++
        Seq((190L, 0, "cold"))).toDF("id", "band", "bkey")
    def run(hot: Long) = DedupOps.joinAcrossBuckets(a, b, Seq("band", "bkey"),
      hotBucketThreshold = hot, splitTarget = 8L)
    val want = ((for (x <- 0L until 40L; y <- 100L until 160L) yield (x, y)) ++
      (for (x <- Seq(90L, 91L); y <- Seq(190L)) yield (x, y))).toSet
    for (guarded <- Seq(run(8L), run(1000000L))) {
      val rows = guarded.as[(Long, Long)].collect().toSeq
      assert(rows.size == rows.toSet.size, "a cross pair was emitted twice")
      assert(rows.toSet == want)
    }
    // One-side-hot mixed case: a hot, b small — sub-group counts adapt
    // per side and coverage still holds.
    val bSmall = Seq((100L, 0, "hot"), (101L, 0, "hot")).toDF("id", "band", "bkey")
    val mixed = DedupOps.joinAcrossBuckets(a.filter(col("bkey") === "hot"), bSmall,
        Seq("band", "bkey"), hotBucketThreshold = 8L, splitTarget = 8L)
      .as[(Long, Long)].collect().toSeq
    assert(mixed.size == mixed.toSet.size)
    assert(mixed.toSet == (for (x <- 0L until 40L; y <- Seq(100L, 101L)) yield (x, y)).toSet)
  }

  test("embeddingPairsAgainstRef: guard forced onto every bucket == default result") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val newV = emb.filter(col("vec_id") % 5 === 0)
    val refV = emb.filter(col("vec_id") % 5 =!= 0)
    def run(hot: Long, split: Long) =
      DedupOps.embeddingPairsAgainstRef(newV, refV, threshold = 0.4, dims = 64,
          hotBucketThreshold = hot, splitTarget = split)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val default = run(DedupOps.HotBucketThreshold, DedupOps.HotBucketSplitTarget)
    val forced = run(1L, 4L)
    assert(default.nonEmpty)
    assert(forced == default,
      s"guard changed the asym result: missing ${(default -- forced).size}, " +
        s"extra ${(forced -- default).size}")
  }

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

  test("semdedupKeepSet: one-cluster adversarial fixture — forced grid == default") {
    import spark.implicits._
    // nlist = 1 puts every vector in ONE cluster, so the within-cluster
    // pair space is a single 190-member hot bucket of mostly DISTINCT
    // vectors (collapse only merges the 10 planted copies). Forcing the
    // grid split must change nothing: the keep rule is independent of
    // WHERE the comparisons run.
    val rnd = new scala.util.Random(11)
    val base = (0 until 180).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() + 0.01f))
    }
    val rows = base ++ (0 until 10).map(i => (1000L + i, base(i)._2))
    val emb = rows.toDF("vec_id", "embedding")
    def run(hot: Long, split: Long) =
      SimilarityOps.semdedupKeepSet(emb, threshold = 0.9, nlist = 1,
          trainIters = 1, hotBucketThreshold = hot, splitTarget = split)
        .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    val default = run(DedupOps.HotBucketThreshold, DedupOps.HotBucketSplitTarget)
    val forced = run(16L, 8L)
    assert(forced == default, "forced grid split changed semdedup verdicts")
    // Planted copies (larger ids than their originals) must all drop.
    (0 until 10).foreach { i =>
      assert(default.contains((1000L + i, false)), s"copy of $i kept") }
    assert(default.exists(_._2), "some vector must survive")
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

  test("maxBucketUpperBound is a sound upper bound at any partitioning (property)") {
    // The tier-1 switch's entire correctness is "never under-count": if
    // the bound says healthy, no hot bucket may exist. Random key
    // multisets with skewed multiplicities, re-partitioned arbitrarily —
    // the shuffle-free sum-of-per-partition-maxima must dominate the
    // exact max bucket count every time.
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val gen = for {
      nKeys <- Gen.choose(1, 12)
      counts <- Gen.listOfN(nKeys, Gen.choose(1, 40))
      parts <- Gen.choose(1, 9)
    } yield (counts, parts)
    graft.PropCheck.check(Prop.forAll(gen) { case (counts, parts) =>
      val rows = counts.zipWithIndex.flatMap { case (c, k) =>
        Seq.fill(c)(k.toLong)
      }
      val df = rows.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("id", "bkey").repartition(parts)
      val exactMax = counts.max.toLong
      val bound = DedupOps.maxBucketUpperBound(df, Seq("bkey"))
      bound >= exactMax
    }, minSuccessful = 30)
  }

  test("maxBucketUpperBound: distinct keys past the tracking cap → bound unknown") {
    // Tier 1's per-partition key map is hard-capped: a partition with
    // more DISTINCT bucket keys than maxTrackedKeys abandons the
    // shuffle-free bound (Long.MaxValue = "unknown", caller falls to the
    // tier-2 exact count) instead of growing the map without bound — the
    // guard must never itself become the memory problem.
    import spark.implicits._
    val manyDistinct = (0 until 1000).map(i => (i.toLong, i.toLong))
      .toDF("id", "bkey").coalesce(1)
    assert(DedupOps.maxBucketUpperBound(manyDistinct, Seq("bkey"),
      maxTrackedKeys = 16) == Long.MaxValue)
    // Cap above the distinct-key count: the bound stays finite and sound.
    val fits = DedupOps.maxBucketUpperBound(manyDistinct, Seq("bkey"),
      maxTrackedKeys = 2048)
    assert(fits >= 1L && fits < Long.MaxValue)
    // The cap counts DISTINCT keys, not rows: heavy repetition of few
    // keys keeps counting under a tiny cap and still bounds the max.
    val fewHot = (0 until 1000).map(i => (i.toLong, (i % 8).toLong))
      .toDF("id", "bkey").coalesce(1)
    val hotBound = DedupOps.maxBucketUpperBound(fewHot, Seq("bkey"),
      maxTrackedKeys = 16)
    assert(hotBound >= 125L && hotBound < Long.MaxValue)
  }
}
