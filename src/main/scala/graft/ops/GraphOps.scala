package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * edge-sized groupBy+join passes, no driver-side data movement; the only
  * driver actions are the per-round convergence probe (a limit-1 job over
  * an edge-sized violation frame) and eager `localCheckpoint`s that
  * truncate the growing lineage (without them, round k replays all k-1
  * prior joins and planning time goes quadratic).
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
    // (`coalesce` on the checkpointed frame moves no data.)
    val eMat = loopSession.createDataFrame(e0.rdd, e0.schema).localCheckpoint(true)
    val nEdges = eMat.count()
    val parts = math.max(1L, math.min(
      callerSession.sparkContext.defaultParallelism.toLong,
      nEdges / 1000000L + 1L)).toInt
    loopSession.conf.set("spark.sql.shuffle.partitions", parts.toString)
    var e = eMat.coalesce(parts)
    var it = 0
    var converged = nEdges == 0L
    while (!converged && it < maxIter) {
      e = smallStar(largeStar(e)).localCheckpoint(true)
      converged = isStarForest(e)
      it += 1
    }
    require(converged, s"connectedComponents: not converged after $maxIter iterations")
    // At the fixpoint `e` is a star forest: every non-root node points
    // straight at its component min, roots appear only as targets. Hand
    // the (materialized) labels back to the caller's session; singletons
    // re-attach with one left join — iteration cost scaled with
    // duplication volume, only this final join is corpus-sized.
    val labels = callerSession.createDataFrame(e.rdd, e.schema)
    val out = nodes.select(col(idCol).cast("long").as("id"))
      .join(labels.select(col("a").as("id"), col("b").as("comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("component_id"))
    (out, it)
  }

  /** Large-star: every node u connects its LARGER neighbors to
    * m = min(Γ(u) ∪ {u}). Works on the symmetric closure; output keeps the
    * big→small orientation (emitted (v, m) has v > u ≥ m). May emit
    * duplicate edges (same (v, m) from different centers) — [[smallStar]]'s
    * groupBy and final distinct absorb them, saving a shuffle here.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val mins = sym.groupBy("a").agg(min("b").as("m"))
    sym.join(mins, "a")
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

  /** EXACT fixpoint test: the big→small edge set is converged iff it is a
    * star forest — every source points at exactly one target and no
    * target is itself a source. Both star steps preserve the graph's
    * component structure, so at that point each star IS one original
    * component and its root (smaller than every child by orientation) is
    * the component min. Unlike a checksum this cannot fake convergence,
    * and it needs no old⋈new comparison — one limit-1 job over an
    * edge-sized violation frame.
    */
  private def isStarForest(e: DataFrame): Boolean = {
    val srcStats = e.groupBy("a").agg(min("b").as("mn"), max("b").as("mx"))
    val multiTarget = srcStats.where(col("mn") =!= col("mx")).select(col("a"))
    val targetIsSource = e.join(srcStats.select(col("a").as("t")),
        e("b") === col("t"), "left_semi").select(col("a"))
    multiTarget.unionByName(targetIsSource).isEmpty
  }
}
