package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Unit tests for the round-3 pipeline operators: connected components
  * (graph edge cases the oracle's single corpus can't cover), deterministic
  * sampling invariants, repetition signals, frame sampling.
  */
class PipelineOpsSpec extends SparkSuite {

  test("connectedComponents: chain, triangle, singletons, multi-hop propagation") {
    import spark.implicits._
    val nodes = (1L to 9L).toDF("id")
    // chain 1-2-3 (diameter 2: label must hop twice), triangle 5-6-7,
    // isolated 4 and 8, pair 9-? none → 9 singleton too.
    val edges = Seq((2L, 1L), (2L, 3L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("src", "dst")
    val got = GraphOps.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 9L))
  }

  test("connectedComponents: empty edge set — every node is a singleton") {
    import spark.implicits._
    val nodes = (1L to 5L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = GraphOps.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == (1L to 5L).map(i => i -> i).toMap)
  }

  test("connectedComponents: long path converges in O(log n) star rounds") {
    import spark.implicits._
    val n = 64L
    val nodes = (1L to n).toDF("id")
    // Path 1-2-...-64 with the min label at one END: worst-case DIAMETER.
    // Min-label propagation would need ~63 rounds; star contraction at
    // least halves pointer depth per round, so well under log2(64)+c.
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val (df, iters) = GraphOps.connectedComponentsWithIterations(nodes, edges)
    val got = df.as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to n).toSet)
    assert(iters <= 8, s"diameter-63 path should contract in O(log n) rounds, took $iters")
  }

  test("connectedComponents: maxIter bounds PRODUCTIVE rounds — converging in " +
      "exactly maxIter rounds succeeds (fused probe observes one round late)") {
    import spark.implicits._
    val nodes = (1L to 3L).toDF("id")
    val edges = Seq((2L, 1L), (3L, 2L)).toDF("src", "dst")
    // This path needs exactly 1 contraction round; the fused convergence
    // metric only observes that from the NEXT (idempotent) round, so
    // maxIter=1 must still succeed — the executed-round bound is
    // maxIter + 1, not maxIter.
    val (df, iters) = GraphOps.connectedComponentsWithIterations(
      nodes, edges, maxIter = 1)
    assert(df.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(iters == 1, s"expected 1 productive round, got $iters")
    // A genuinely unconverged graph at maxIter still fails loudly.
    val big = (1L to 64L).toDF("id")
    val bigEdges = (1L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    val err = intercept[IllegalArgumentException] {
      GraphOps.connectedComponents(big, bigEdges, maxIter = 1)
    }
    assert(err.getMessage.contains("not converged"), err.getMessage)
  }

  test("connectedComponents: loop conf is session-isolated — concurrent " +
      "queries keep the caller's shuffle partition count") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val n = 1024L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = Future(GraphOps.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap)
    // While the CC loop runs (on its own newSession with a 1-partition
    // conf), queries on the caller's session must still PLAN their
    // shuffles at the caller's width (pre-AQE sparkPlan — AQE may later
    // coalesce small shuffles, which is unrelated to conf isolation).
    // All three probes run UNCONDITIONALLY (never vacuous): the 1024-node
    // chain keeps the loop busy for several seconds, so in practice they
    // overlap it, and isolation must hold during AND after regardless.
    var observedDuring = 0
    while (observedDuring < 3) {
      assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
      val shuffled = spark.range(1000).groupBy((col("id") % 7).as("g")).count()
      // Exchanges are inserted by EnsureRequirements; under AQE the
      // pre-execution plan sits inside AdaptiveSparkPlanExec.
      val physical = shuffled.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val widths = physical.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.outputPartitioning.numPartitions
      }
      assert(widths.nonEmpty && widths.forall(_ == before.toInt),
        s"concurrent query planned shuffle widths $widths, expected $before")
      observedDuring += 1
    }
    val got = Await.result(cc, 5.minutes)
    assert(got.values.toSet == Set(1L) && got.keySet == (1L to n).toSet)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("connectedComponents: labels are invariant to the input partition layout") {
    import spark.implicits._
    // Mixed shapes (two merged stars, a chain, singletons) with edges
    // deliberately scattered across layouts: 1 partition, a prime count,
    // and more partitions than edges. The loop narrows its own shuffle
    // width from the edge volume (GraphOps width sizing), so the LABELS
    // must depend only on the graph, never on how the frames arrived —
    // the same invariance contract LayoutOpsSpec pins for shard packing.
    val n = 200L
    val nodes = (1L to n).toDF("id")
    val edges = ((1L until 60L).map(i => (i, i + 1)) ++       // chain 1..60
      (70L to 90L).map(i => (i, 65L)) ++                      // star at 65
      (91L to 110L).map(i => (i, 70L)) ++                     // star merged into it
      Seq((150L, 151L))).toDF("src", "dst")
    val want = GraphOps.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 7, 64)) {
      val got = GraphOps.connectedComponents(
          nodes.repartition(parts), edges.repartition(parts))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"parts=$parts")
    }
    assert(want(60L) == 1L && want(110L) == 65L && want(150L) == 150L)
  }

  test("property: star-contraction CC equals reference union-find on random graphs") {
    import graft.PropCheck
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    // Reference implementation: classic union-find with path compression,
    // min-id root canonicalization — a completely independent formulation.
    def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val byRoot = nodes.groupBy(find)
      byRoot.flatMap { case (_, members) =>
        val m = members.min; members.map(_ -> m)
      }
    }
    // Small dense-ish graphs hit every shape: self-loops, duplicate and
    // reversed edges, isolated nodes, chains, merged stars.
    val gen = for {
      n <- Gen.choose(1, 40)
      m <- Gen.choose(0, 80)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(1L, n.toLong)
        b <- Gen.choose(1L, n.toLong)
      } yield (a, b))
    } yield (n.toLong, edges)
    // 25 samples: each evaluation runs the full distributed CC loop.
    PropCheck.check(Prop.forAll(gen) { case (n, edges) =>
      val nodes = (1L to n).toDF("id")
      val edgeDf = edges.toDF("src", "dst")
      val got = GraphOps.connectedComponents(nodes, edgeDf)
        .as[(Long, Long)].collect().toMap
      got == unionFind(1L to n, edges)
    }, minSuccessful = 25)
  }

  test("hash sampling: deterministic, order-independent, roughly at rate") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("k")
    val picked = df.filter(SamplingOps.hashSampleFlag(col("k"), 10, 1))
      .as[Long].collect().toSet
    // Re-evaluation and row-order changes select the SAME rows.
    val again = df.orderBy(col("k").desc)
      .filter(SamplingOps.hashSampleFlag(col("k"), 10, 1))
      .as[Long].collect().toSet
    assert(picked == again)
    assert(picked.size > 120 && picked.size < 280, s"~10% of 2000, got ${picked.size}")
    // Different salt draws an independent sample.
    val other = df.filter(SamplingOps.hashSampleFlag(col("k"), 10, 1, salt = "z"))
      .as[Long].collect().toSet
    assert(other != picked)
  }

  test("stratifiedCap: at most N per group, deterministic selection") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("k", "g")
    val capped = SamplingOps.stratifiedCap(df, Seq("g"), cap = 10, key = col("k"))
    val byG = capped.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG.values.forall(_ == 10), byG.toString)
    val twice = SamplingOps.stratifiedCap(df.orderBy(col("k").desc), Seq("g"),
      cap = 10, key = col("k"))
    assert(capped.select("k").as[Long].collect().toSet ==
      twice.select("k").as[Long].collect().toSet)
  }

  test("repetitionSignals: hand-computed ratios, short-doc null bigram") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a b"),       // top unigram a:3/4; bigrams: "a a"x2,"a b" → 2/3
      (2L, "x"),             // 1 token → bigram ratio null
      (3L, "p q p q p q")).toDF("doc_id", "text") // uni p:3/6; bi "p q":3/5
    val got = TextOps.repetitionSignals(df).orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_tokens") == 4L)
    assert(got(0).getAs[Double]("top_unigram_ratio") == 0.75)
    assert(got(0).getAs[Double]("top_bigram_ratio") == math.rint(2.0 / 3 * 1e6) / 1e6)
    assert(got(1).isNullAt(got(1).fieldIndex("top_bigram_ratio")))
    assert(got(2).getAs[Double]("top_unigram_ratio") == 0.5)
    assert(got(2).getAs[Double]("top_bigram_ratio") == 0.6)
  }

  test("sampleFrames: every step-th index, deterministic stub hashes, no shuffle") {
    import spark.implicits._
    val decoded = Seq((1L, 5L, "aaaa"), (2L, 0L, "bbbb"), (3L, 1L, "cccc"))
      .toDF("doc_id", "fake_frames", "content_md5")
    val got = MultimodalOps.sampleFrames(decoded, step = 2)
      .orderBy("doc_id", "frame_idx").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 0L), (1L, 2L), (1L, 4L), (3L, 0L)))
    assert(got.forall(!_.isNullAt(2)))
    val plan = MultimodalOps.sampleFrames(decoded, 2).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling must be map-side:\n$plan")
  }

  test("pipeline pack stage survives a >100-chunk document (no capacity " +
      "constant in the chunk key)") {
    import spark.implicits._
    // 4200 whitespace tokens at maxTokens=40 / overlap=8 (stride 32) →
    // 131 chunks — past the 100-chunk ceiling an arithmetic
    // `doc_id * 100 + chunk_idx` key encoding silently corrupts. The
    // compound-key pack must handle it exactly.
    val long = (0 until 4200).map(i => s"t$i").mkString(" ")
    val docs = Seq((7L, long), (8L, "short doc here"), (9L, long + " tail"))
      .toDF("doc_id", "text")
    val chunks = TextOps.chunkByTokenBudget(docs, maxTokens = 40, overlap = 8)
      .select("doc_id", "chunk_idx", "chunk_tokens")
    val perDoc = chunks.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(perDoc(7L) > 100, s"expected >100 chunks, got ${perDoc(7L)}")
    val packed = LayoutOps.packByTokenBudgetKeys(chunks,
        Seq("doc_id", "chunk_idx"), "chunk_tokens", budget = 2000L)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(packed.length == perDoc.values.sum)
    // Sequential-scan invariant: each offset = previous offset + weight,
    // across the 100-chunk boundary and across document boundaries.
    packed.sliding(2).foreach {
      case Array((_, _, w1, o1, _), (_, _, _, o2, _)) => assert(o2 == o1 + w1)
      case _ =>
    }
    assert(packed.forall { case (_, _, _, o, s) => s == o / 2000L })
  }
}
