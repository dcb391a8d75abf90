package graft.ops

import org.apache.spark.sql.DataFrame

/** Caching contract for operators that must persist an intermediate frame
  * (per-doc signatures/shingles — see the optimizer-inlining note in
  * [[DedupOps]]): the op persists its intermediates, materializes its
  * (small, by contract: pairs/top-k, never corpus-sized) result with an
  * eager `localCheckpoint`, and unpersists before returning.
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
