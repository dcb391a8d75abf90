package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable curation pipeline — the PUBLIC shape of what the
  * registered end-to-end programs (pipeline_curate_v3 and its funnel,
  * GraftQueries) compose by hand: a named chain of DataFrame → DataFrame
  * stages where
  *
  *  - each stage's output is materialized ONCE through the shared
  *    [[Caching]] seam (eager `localCheckpoint`, or a RELIABLE
  *    checkpoint when `spark.graft.checkpointDir` is set), so every
  *    downstream consumer — the next stage, the final output, and the
  *    funnel report — reads the run's artifact instead of re-running
  *    the chain (jobs never share exchanges; without the pin a chain of
  *    k stages re-executes stage 1 up to k times);
  *  - the run keeps every intermediate, so the operational funnel
  *    (docs/tokens surviving each stage — the report a pipeline run
  *    prints first) is a per-stage aggregate over already-materialized
  *    frames.
  *
  * Scale posture: the pipeline adds NO work beyond its stages — one
  * eager materialization per stage (exactly the per-op Caching contract
  * the stages already follow internally) and bounded driver state (the
  * stage list). At 100 TB the same advice as the Caching scaladoc
  * applies: chains that only need one stage's aggregate should compose
  * op internals instead of paying per-stage materialization, and
  * cluster runs should set `spark.graft.checkpointDir` so a lost
  * executor cannot orphan a truncated lineage.
  *
  * {{{
  * val run = CurationPipeline("input")
  *   .stage("paragraph_dedup") { df => ... }
  *   .stage("substring_dedup") { df => ... }
  *   .run(docs)
  * run.output                       // last stage's frame
  * run.funnel(df => size(col("tk")))// stage_idx, stage, n_docs, n_tokens
  * }}}
  */
final class CurationPipeline private (
    inputName: String, stages: Vector[(String, DataFrame => DataFrame)]) {

  /** Append a named stage. Names must be unique (they key the funnel). */
  def stage(name: String)(f: DataFrame => DataFrame): CurationPipeline = {
    require(name.nonEmpty && name != inputName && !stages.exists(_._1 == name),
      s"stage name '$name' empty or already used")
    new CurationPipeline(inputName, stages :+ (name -> f))
  }

  /** Execute the chain: each stage consumes the previous stage's
    * MATERIALIZED frame. The input itself is recorded un-materialized
    * (it is typically a plain table scan).
    */
  def run(input: DataFrame): CurationPipeline.Run = {
    require(stages.nonEmpty, "pipeline has no stages")
    val out = stages.foldLeft(Vector(inputName -> input)) {
      case (acc, (name, f)) =>
        acc :+ (name -> Caching.materialize(f(acc.last._2)))
    }
    CurationPipeline.Run(out)
  }
}

object CurationPipeline {
  /** Start a pipeline; `inputName` labels stage 0 in the funnel. */
  def apply(inputName: String = "input"): CurationPipeline =
    new CurationPipeline(inputName, Vector.empty)

  /** A finished run: every stage's materialized frame, in order. */
  final case class Run(stages: Vector[(String, DataFrame)]) {
    require(stages.nonEmpty, "a pipeline run records at least its input")

    /** The last stage's frame — the pipeline's product. */
    def output: DataFrame = stages.last._2

    /** Stage frame by name (the funnel's `stage` column values). */
    def apply(name: String): DataFrame =
      stages.collectFirst { case (`name`, df) => df }.getOrElse(
        throw new NoSuchElementException(
          s"no stage '$name' in ${stages.map(_._1).mkString(", ")}"))

    /** The operational funnel: one row per stage with document count and
      * a token total, computed from the run's materialized frames.
      * `tokensOf` maps each stage's frame to its token-count column
      * (stages legitimately differ — raw text before dedup, rewritten
      * text after). Token sums are cast to long so the report is
      * engine-portable (the OutputShapeSpec contract).
      */
    def funnel(tokensOf: DataFrame => Column): DataFrame =
      stages.zipWithIndex.map { case ((name, df), idx) =>
        df.agg(count(lit(1)).as("n_docs"),
            // coalesce: sum over an empty stage is NULL, and the funnel
            // promises a long total (getLong-safe, engine-portable)
            coalesce(sum(tokensOf(df)), lit(0L)).cast("bigint")
              .as("n_tokens"))
          .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
            col("n_docs"), col("n_tokens"))
      }.reduce(_ unionAll _)
  }
}
