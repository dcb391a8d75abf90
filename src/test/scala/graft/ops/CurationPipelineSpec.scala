package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[CurationPipeline]] — the public builder must reproduce exactly what
  * the hand-composed registered pipeline computes (same ops, same stage
  * order), and its funnel must agree with per-stage recomputation.
  */
class CurationPipelineSpec extends SparkSuite {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  // 8-word pseudo-paragraphs — same derivation as the registered
  // paragraph queries (GraftQueries.derivedParas).
  private def derivedParas(df: DataFrame): DataFrame = df
    .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
    .select(col("doc_id"),
      expr("transform(sequence(0, ((size(tk) + 7) div 8) - 1), " +
        "i -> array_join(slice(tk, i * 8 + 1, 8), ' '))").as("paras"))

  test("builder-composed v3 chain == hand-composed ops; funnel consistent") {
    val run = CurationPipeline("input")
      .stage("paragraph_dedup") { d =>
        TextOps.dedupParagraphsAcrossDocs(derivedParas(d))
          .filter(col("n_kept") > 0)
          .select(col("doc_id"),
            translate(col("text_deduped"), "\n", " ").as("ptext"))
      }
      .stage("substring_dedup") { d =>
        TextOps.dedupSubstringsAcrossDocs(d, n = 8, textCol = "ptext")
          .filter(length(col("text_dedup")) > 0)
          .select(col("doc_id"), col("text_dedup"))
      }
      .run(docs)

    // Stage frames equal the directly-composed ops row-for-row.
    val pdDirect = TextOps.dedupParagraphsAcrossDocs(derivedParas(docs))
      .filter(col("n_kept") > 0)
      .select(col("doc_id"),
        translate(col("text_deduped"), "\n", " ").as("ptext"))
    val sdDirect = TextOps.dedupSubstringsAcrossDocs(pdDirect, n = 8,
        textCol = "ptext")
      .filter(length(col("text_dedup")) > 0)
      .select(col("doc_id"), col("text_dedup"))
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(run("paragraph_dedup")) == rows(pdDirect))
    assert(rows(run.output) == rows(sdDirect))

    // Funnel: one row per stage, counts/tokens matching direct aggregates.
    val funnel = run.funnel { df =>
      if (df.columns.contains("text_dedup")) size(split(col("text_dedup"), " "))
      else if (df.columns.contains("ptext")) size(split(col("ptext"), " "))
      else size(TextOps.tokens(col("text")))
    }.orderBy("stage_idx").collect()
    assert(funnel.map(_.getAs[String]("stage")).toSeq ==
      Seq("input", "paragraph_dedup", "substring_dedup"))
    assert(funnel(0).getAs[Long]("n_docs") == docs.count())
    assert(funnel(1).getAs[Long]("n_docs") == pdDirect.count())
    assert(funnel(2).getAs[Long]("n_docs") == sdDirect.count())
    val sdTokens = sdDirect
      .agg(sum(size(split(col("text_dedup"), " "))).cast("bigint")).head().getLong(0)
    assert(funnel(2).getAs[Long]("n_tokens") == sdTokens)
    // Monotone survival: each stage can only shrink the corpus.
    assert(funnel(1).getAs[Long]("n_docs") <= funnel(0).getAs[Long]("n_docs"))
    assert(funnel(2).getAs[Long]("n_docs") <= funnel(1).getAs[Long]("n_docs"))
  }

  test("run save/load round-trip: stage frames and funnel survive a new consumer") {
    val pipeline = CurationPipeline("input")
      .stage("quality") { d =>
        TextOps.withQualityScore(d).filter(col("quality_score") >= 0.3)
          .select(col("doc_id"), col("text"))
      }
      .stage("short_drop") { d =>
        d.filter(size(TextOps.tokens(col("text"))) >= 5)
      }
    val run = pipeline.run(docs)
    val path = tmp("pipeline-run") + "/run"
    run.save(path)
    val loaded = CurationPipeline.Run.load(spark, path)
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(loaded.stages.map(_._1) == run.stages.map(_._1))
    run.stages.zip(loaded.stages).foreach { case ((name, orig), (_, back)) =>
      assert(rows(orig) == rows(back), s"stage '$name' diverged after load")
    }
    // The funnel recomputes identically from the persisted frames.
    def tok(df: DataFrame) = size(TextOps.tokens(col("text")))
    assert(rows(run.funnel(tok)) == rows(loaded.funnel(tok)))

    // RE-SAVING a different run to the same path fully replaces the
    // previous generation (meta is deleted first, then rewritten last,
    // so load never sees a mix): a one-stage run over a smaller input
    // saved on top of the two-stage run above must load back as exactly
    // itself.
    val second = CurationPipeline("input")
      .stage("take")(d => d.limit(7)).run(docs)
    second.save(path)
    val reloaded = CurationPipeline.Run.load(spark, path)
    assert(reloaded.stages.map(_._1) == Vector("input", "take"))
    assert(reloaded.output.count() == 7)
  }

  test("resume from a saved prefix is row-identical to the uninterrupted run") {
    def qualityStage(d: DataFrame) =
      TextOps.withQualityScore(d).filter(col("quality_score") >= 0.3)
        .select(col("doc_id"), col("text"))
    def shortStage(d: DataFrame) =
      d.filter(size(TextOps.tokens(col("text"))) >= 5)
    val full = CurationPipeline("input")
      .stage("quality")(qualityStage).stage("short_drop")(shortStage)
    // The "interrupted" run: only stage 1 completed and was saved.
    val path = tmp("pipeline-resume") + "/run"
    CurationPipeline("input").stage("quality")(qualityStage)
      .run(docs).save(path)
    val resumed = full.resume(CurationPipeline.Run.load(spark, path))
    val uninterrupted = full.run(docs)
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(resumed.stages.map(_._1) == uninterrupted.stages.map(_._1))
    assert(rows(resumed.output) == rows(uninterrupted.output))
    assert(rows(resumed("quality")) == rows(uninterrupted("quality")))
    // A saved run from a DIFFERENT pipeline shape is refused loudly.
    intercept[IllegalArgumentException] {
      CurationPipeline("input").stage("other")(identity)
        .resume(CurationPipeline.Run.load(spark, path))
    }
    // A fully-completed saved run resumes to itself (no stages re-run).
    val done = uninterrupted
    val donePath = tmp("pipeline-resume-done") + "/run"
    done.save(donePath)
    val reDone = full.resume(CurationPipeline.Run.load(spark, donePath))
    assert(rows(reDone.output) == rows(done.output))
  }

  test("builder API contracts: unique names, non-empty chain, stage lookup") {
    intercept[IllegalArgumentException] {
      CurationPipeline("input").stage("a")(identity).stage("a")(identity)
    }
    intercept[IllegalArgumentException] {
      CurationPipeline().run(docs)
    }
    val run = CurationPipeline().stage("only")(d => d.limit(3)).run(docs)
    assert(run("only").count() == 3)
    intercept[NoSuchElementException] { run("missing") }
  }
}
