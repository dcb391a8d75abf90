package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives needed by dedup pipelines. The one that
  * matters at 100 TB: near-dup PAIRS (from [[DedupOps]]) must become
  * CLUSTERS before survivors can be chosen — a connected-components pass
  * over the pair graph, here as iterative min-label propagation on plain
  * DataFrames (north star, SURVEY.md §2.8; the reference has no graph
  * surface — this is additive).
  *
  * Scale shape: each iteration is one equi-join (labels ⋈ edges, shuffled
  * on the node id) + one groupBy-min — both shuffle-partitioned by id, no
  * driver-side data movement; the only driver actions are one tiny
  * aggregate per iteration (the convergence test) and `localCheckpoint`s
  * that truncate the growing lineage (without them, iteration k replays
  * all k-1 prior joins and planning time goes quadratic). Iteration count
  * is the component DIAMETER — near-dup clusters are shallow (dup groups
  * link through shared content, rarely chains), so a handful of rounds
  * suffices; for adversarially long chains swap the body for the
  * large-star/small-star steps (O(log n) rounds) — the loop and
  * convergence machinery stay identical.
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
      maxIter: Int = 50): DataFrame = {
    // Symmetrize once; checkpointed because every iteration re-reads it.
    val symWide = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .unionByName(edges.select(col(dstCol).cast("long").as("a"),
        col(srcCol).cast("long").as("b")))
      .distinct()
      .localCheckpoint(true)
    // Size the loop's parallelism to the EDGE volume, not the session
    // default: the pair graph is a vanishing fraction of the corpus, and
    // every iteration pays per-task scheduling on every shuffle partition
    // — with the session's partition count, a few-hundred-edge graph
    // spends seconds of pure task overhead per round. ~1M edges per
    // partition keeps partitions comfortably in memory at any scale.
    // (`coalesce` on the checkpointed frame moves no data.)
    val spark = nodes.sparkSession
    val nEdges = symWide.count()
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, nEdges / 1000000L + 1L)).toInt
    val sym = symWide.coalesce(parts).localCheckpoint(true)
    // The loop's shuffles (join + groupBy, all edge-sized) run eagerly
    // under the narrowed partition count — every frame is materialized by
    // localCheckpoint(true) inside the try. The session conf is restored
    // before the caller's (lazy, corpus-sized) final join executes.
    // NOTE: the set/restore is session-scoped — concurrent queries on the
    // same SparkSession during the loop would observe the narrowed value;
    // run CC on its own session (newSession()) if that matters.
    val shuffleKey = "spark.sql.shuffle.partitions"
    val oldShuffle = spark.conf.get(shuffleKey)
    spark.conf.set(shuffleKey, parts.toString)
    // Iterate ONLY over nodes touched by an edge: in a dedup pipeline the
    // pair graph is a vanishing fraction of the corpus (most docs are
    // unique), so the loop's joins run on |pairs|-sized frames, not
    // |corpus|-sized ones; singletons re-attach with one left join at the
    // end. This is what keeps the loop cheap at 100 TB: iteration cost
    // scales with duplication volume, not corpus volume.
    var labels = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
    try {
    labels = labels.localCheckpoint(true)
    // Labels only ever DECREASE, so sum(comp) strictly decreases until the
    // fixpoint: sum-equality is a complete convergence test that needs no
    // old⋈new join. Cast BEFORE summing so the aggregation itself runs in
    // decimal(38,0) — a LongType sum would silently wrap at billions of
    // large ids and could fake convergence.
    def sig(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
    var prev = sig(labels)
    var it = 0
    var converged = prev == null // empty edge set (sum over no rows): done
    while (!converged && it < maxIter) {
      val prop = labels.join(sym, labels("id") === sym("a"))
        .select(sym("b").as("id"), col("comp"))
      val next = labels.unionByName(prop)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint(true)
      val cur = sig(next)
      converged = cur.compareTo(prev) == 0
      prev = cur
      labels = next
      it += 1
    }
    require(converged, s"connectedComponents: not converged after $maxIter iterations")
    } finally spark.conf.set(shuffleKey, oldShuffle)
    nodes.select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("component_id"))
  }
}
