package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    CurationPipeline.Run(execute(Vector(inputName -> input), stages))
  }

  /** RESUME an interrupted run: `partial` holds the input plus a PREFIX
    * of this pipeline's stages (typically [[CurationPipeline.Run.load]]
    * of a [[CurationPipeline.Run.save]] taken before the interruption).
    * Only the remaining stages execute, each consuming the prior
    * persisted frame exactly as the uninterrupted run would have
    * consumed its materialized twin — stages are pure frame functions,
    * so the resumed output is row-identical to an uninterrupted run
    * (spec-pinned). Stage names are matched positionally and must agree
    * (a resume against a DIFFERENT pipeline shape is a hard error, not
    * a silent recompute).
    */
  def resume(partial: CurationPipeline.Run): CurationPipeline.Run = {
    val doneNames = partial.stages.map(_._1)
    val expected = inputName +: stages.map(_._1)
    require(doneNames.size <= expected.size &&
      expected.take(doneNames.size) == doneNames,
      s"resume: saved run stages [${doneNames.mkString(", ")}] are not a " +
        s"prefix of this pipeline [${expected.mkString(", ")}]")
    CurationPipeline.Run(
      execute(partial.stages, stages.drop(doneNames.size - 1)))
  }

  private def execute(done: Vector[(String, DataFrame)],
      todo: Vector[(String, DataFrame => DataFrame)]): Vector[(String, DataFrame)] =
    todo.foldLeft(done) { case (acc, (name, f)) =>
      acc :+ (name -> Caching.materialize(f(acc.last._2)))
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

    /** PERSIST the run: every stage frame as parquet (distributed —
      * stage frames are corpus-sized) plus a stage_idx → name meta
      * table, written LAST as the commit marker: a save interrupted
      * mid-write leaves no meta, so [[Run.load]] fails loudly instead
      * of resuming from a torn run. The saved run is the recovery
      * artifact the session-only checkpoint blocks are not: a NEW
      * session can [[Run.load]] it and read stage outputs, re-derive
      * the funnel, or [[CurationPipeline.resume]] the remaining stages.
      */
    def save(path: String): Unit = {
      val spark = stages.head._2.sparkSession
      import spark.implicits._
      // Drop any PREVIOUS save's marker before touching stage frames:
      // re-saving over an old run must not leave the old meta visible
      // while new frames are half-written, or an interruption would
      // make load() return a torn mix of generations instead of
      // failing loudly.
      val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
      metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(metaPath, true)
      stages.zipWithIndex.foreach { case ((_, df), i) =>
        df.write.mode("overwrite").parquet(s"$path/stage_$i")
      }
      stages.zipWithIndex.map { case ((n, _), i) => (i, n) }
        .toDF("stage_idx", "stage")
        .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    }
  }

  object Run {
    /** Load a [[Run.save]]d run: stage frames come back as plain
      * parquet scans in saved order — no driver materialization, and
      * downstream consumers (funnel, resume) read the persisted bytes
      * instead of any lineage. */
    def load(spark: SparkSession, path: String): Run = {
      val names = spark.read.parquet(s"$path/meta")
        .select(col("stage_idx").cast("int"), col("stage"))
        .collect().sortBy(_.getInt(0)).map(_.getString(1))
      Run(names.zipWithIndex.map { case (n, i) =>
        n -> spark.read.parquet(s"$path/stage_$i")
      }.toVector)
    }
  }
}
