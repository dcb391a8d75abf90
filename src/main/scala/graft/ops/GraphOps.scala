package graft.ops

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Distributed graph primitives needed by dedup pipelines. The one that
  * matters at 100 TB: near-dup PAIRS (from [[DedupOps]]) must become
  * CLUSTERS before survivors can be chosen — a connected-components pass
  * over the pair graph (north star, SURVEY.md §2.8; the reference has no
  * graph surface — this is additive).
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris,
  * Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
  * MapReduce and Beyond", SoCC 2014). Each round halves-or-better the
  * pointer depth, so the round count is O(log n) in the component size —
  * independent of component DIAMETER, unlike min-label propagation whose
  * round count grows with the longest dup chain. Every round is two
  * edge-sized groupBy+join passes, no driver-side data movement, and ONE
  * driver action: the eager `localCheckpoint` that truncates the growing
  * lineage (without it, round k replays all k-1 prior joins and planning
  * time goes quadratic). Convergence is observed from that same action —
  * the star-forest test is a per-center aggregate over the symmetrized
  * edge set, which large-star's own groupBy already computes, so two extra
  * aggregate columns and an `observe()` metric replace what used to be a
  * separate per-round probe job (round 6's latency hotspot: ~3
  * driver-coordinated jobs per round for a few thousand edges).
  *
  * The whole loop runs on its own `SparkSession.newSession()` (shared
  * SparkContext, private SQLConf) with `spark.sql.shuffle.partitions`
  * sized to the EDGE volume — the pair graph is a vanishing fraction of
  * the corpus, and per-task scheduling overhead on a corpus-sized
  * partition count would dominate each round. Concurrent queries on the
  * caller's session never observe the narrowed value.
  */
object GraphOps {

  /** Connected components of the undirected graph (`nodes`, `edges`):
    * returns (`id`, `component_id`) where `component_id` is the MINIMUM
    * node id in the component — a canonical, deterministic cluster key.
    *
    * @param nodes one column: the node id (numeric); isolated nodes form
    *              singleton components
    * @param edges two columns (src, dst); endpoints must appear in `nodes`
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      idCol: String = "id", srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 50): DataFrame =
    connectedComponentsWithIterations(nodes, edges, idCol, srcCol, dstCol,
      maxIter)._1

  /** [[connectedComponents]] plus the number of contraction rounds the
    * loop ran — exposed so scale tests can assert the O(log n) bound.
    */
  def connectedComponentsWithIterations(nodes: DataFrame, edges: DataFrame,
      idCol: String = "id", srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 50): (DataFrame, Int) = {
    val callerSession = nodes.sparkSession
    // Orient every edge big→small once (self-loops dropped); the loop
    // keeps this invariant, so `b` is always a candidate component min.
    val e0 = edges.select(
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    // The loop runs on its own session: same SparkContext (so the
    // checkpointed RDDs carry over), private SQLConf — narrowing the
    // shuffle width below is invisible to concurrent queries on the
    // caller's session, and the caller's (corpus-sized) final join below
    // still plans with the caller's own partition count. AQE is off for
    // the loop: every loop shuffle is pre-sized to the edge volume, so
    // adaptive re-planning only adds per-stage scheduling latency to each
    // round (measured ~2× on small graphs).
    val loopSession = callerSession.newSession()
    loopSession.conf.set("spark.sql.adaptive.enabled", "false")
    // Materialize the oriented edge set ONCE, directly in the loop
    // session (the orient+distinct shuffle runs at the caller's width —
    // it reads caller-sized input), then size the loop's parallelism to
    // the EDGE volume, not the session default: most docs are unique, so
    // the pair graph is tiny relative to the corpus, and every round pays
    // per-task scheduling on every shuffle partition. ~1M edges per
    // partition keeps partitions comfortably in memory at any scale.
    // (`coalesce` on the checkpointed frame moves no data.) The handoff
    // reuses the executed plan's InternalRow RDD (Bridge) — no per-edge
    // InternalRow→Row→InternalRow serde on entry or exit of the loop.
    val eMat = Bridge.ofInternalRows(loopSession, e0.schema, Bridge.internalRows(e0))
      .localCheckpoint(true)
    val nEdges = eMat.count()
    val parts = math.max(1L, math.min(
      callerSession.sparkContext.defaultParallelism.toLong,
      nEdges / 1000000L + 1L)).toInt
    loopSession.conf.set("spark.sql.shuffle.partitions", parts.toString)
    var e = eMat.coalesce(parts)
    var it = 0
    var converged = nEdges == 0L
    // `maxIter` bounds PRODUCTIVE contraction rounds. The fused metric
    // describes each round's INPUT, so convergence after exactly maxIter
    // productive rounds is only observable by the (idempotent) confirming
    // round after them — hence the executed-round bound is maxIter + 1.
    // Without the +1, a graph converging in exactly maxIter rounds would
    // fail the require below on a fully-correct result.
    while (!converged && it < maxIter + 1) {
      val obs = Observation()
      e = smallStar(largeStarObserved(e, obs)).localCheckpoint(true)
      it += 1
      // The metric describes this round's INPUT; 0 violations means the
      // round was an identity pass over an already-converged forest (both
      // star steps are no-ops on a star forest), i.e. the PREVIOUS round
      // reached the fixpoint. Detecting it here costs one idempotent
      // confirming round but zero extra jobs — `get` blocks only until the
      // checkpoint action above delivers the metric.
      converged = Option(obs.get("violations"))
        .forall(_.asInstanceOf[Number].longValue == 0L)
    }
    require(converged,
      s"connectedComponents: not converged after $maxIter contraction rounds")
    // At the fixpoint `e` is a star forest: every non-root node points
    // straight at its component min, roots appear only as targets. Hand
    // the (materialized) labels back to the caller's session; singletons
    // re-attach with one left join — iteration cost scaled with
    // duplication volume, only this final join is corpus-sized.
    val labels = Bridge.ofInternalRows(callerSession, e.schema, Bridge.internalRows(e))
    val out = nodes.select(col(idCol).cast("long").as("id"))
      .join(labels.select(col("a").as("id"), col("b").as("comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("component_id"))
    // `it` counts executed rounds including the final confirming pass, so
    // contraction rounds NEEDED — the quantity the O(log n) bound speaks
    // about, and what this returned before the probe was fused — is it-1
    // (0 when the input was already a star forest).
    (out, math.max(it - 1, 0))
  }

  /** Large-star: every node u connects its LARGER neighbors to
    * m = min(Γ(u) ∪ {u}). Works on the symmetric closure; output keeps the
    * big→small orientation (emitted (v, m) has v > u ≥ m). May emit
    * duplicate edges (same (v, m) from different centers) — [[smallStar]]'s
    * groupBy and final distinct absorb them, saving a shuffle here.
    *
    * The star-forest fixpoint test on the INPUT rides along the per-center
    * groupBy this step already runs. On the big→small edge set, `e` is a
    * star forest iff no center of `sym` (a) has BOTH a smaller and a larger
    * neighbor — an edge source that is also a target — or (b) has ≥ 2
    * smaller neighbors — a multi-target source. (Forward: a root's
    * neighbors are all larger, a child's single neighbor is its root.
    * Reverse: for any edge (a,b), a>b, center a has a smaller neighbor, so
    * no-mix ⇒ a is never a target, and ≤1-smaller ⇒ a has one target —
    * exactly the star-forest conditions.) `sym` is duplicate-free (e is
    * distinct and strictly oriented), so the counts are neighbor counts.
    * The violation total lands in `obs` when the round's checkpoint action
    * runs — no separate probe job.
    */
  private def largeStarObserved(e: DataFrame, obs: Observation): DataFrame = {
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val stats = sym.groupBy("a").agg(
        min("b").as("m"), max("b").as("mx"),
        sum(when(col("b") < col("a"), 1L).otherwise(0L)).as("n_smaller"))
      .observe(obs, sum(when(
          (col("m") < col("a") && col("mx") > col("a")) || col("n_smaller") >= 2L,
          1L).otherwise(0L)).as("violations"))
    sym.join(stats.select("a", "m"), "a")
      .where(col("b") > col("a"))
      .select(col("b").as("a"), least(col("m"), col("a")).as("b"))
  }

  /** Small-star: every node u (as the larger endpoint) connects its
    * smaller neighbors AND itself to m = min of those neighbors. Input and
    * output are big→small oriented.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("a").agg(min("b").as("m"))
    val nbrs = e.join(mins, "a")
      .where(col("b") =!= col("m"))
      .select(col("b").as("a"), col("m").as("b"))
    nbrs.unionByName(mins.select(col("a"), col("m").as("b"))).distinct()
  }
}
