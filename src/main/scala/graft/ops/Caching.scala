package graft.ops

import org.apache.spark.sql.DataFrame

/** Caching contract for operators that must persist an intermediate frame
  * (per-doc signatures/shingles — see the optimizer-inlining note in
  * [[DedupOps]]): the op persists its intermediates, materializes its
  * result with an eager `localCheckpoint`, and unpersists before
  * returning.
  *
  * Result sizes come in two classes, both bounded relative to the
  * intermediates they replace: OUTPUT-sized (pairs/top-k — the dedup and
  * ANN ops) and PER-DOCUMENT frames (one narrow row per doc — the
  * rewrite/scoring ops like dedupSubstringsAcrossDocs or
  * dsirLogWeights). The per-doc class scales with corpus row count; the
  * eager checkpoint is still the contract because the `finally`
  * unpersists the inputs — a lazy result would silently recompute the
  * whole op per downstream action. A pipeline chaining several rewrite
  * ops (pipeline_curate_v3) therefore materializes one narrow per-doc
  * frame per stage; callers that need only an aggregate of ONE stage at
  * extreme scale should compose the op's internals instead of paying the
  * checkpoint.
  *
  * Library callers therefore get a self-contained DataFrame and never
  * accumulate cached blocks across calls in a long-lived session; the
  * checkpointed result's own blocks are released by Spark's
  * `ContextCleaner` once the returned frame becomes unreachable.
  */
private[graft] object Caching {

  /** Persist `frames`, evaluate `body` eagerly (localCheckpoint), release. */
  def withCached(frames: DataFrame*)(body: => DataFrame): DataFrame = {
    frames.foreach(_.persist())
    try body.localCheckpoint(eager = true)
    finally frames.foreach(_.unpersist(blocking = false))
  }
}
