package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-corpus curation operators — the steps that relate the TRAINING
  * corpus to a second, external corpus (benchmark/eval sets), as opposed
  * to the within-corpus dedup of [[DedupOps]].
  *
  * North-star capability (SURVEY.md §2.8 additive surface): every serious
  * LLM training pipeline decontaminates against its evaluation benchmarks
  * — a train document sharing a word n-gram with any eval document is
  * flagged (and usually dropped) so benchmark scores measure
  * generalization, not memorization. The reference has no such surface;
  * the operator composes the same tokenizer its WordCount demo uses
  * (/root/reference/README.md:84-86).
  */
object CurationOps {

  /** N-gram–overlap decontamination of `train` against `evalSet`.
    *
    * Returns every `train` row with three added columns:
    *  - `n_contaminated` — count of DISTINCT word `n`-grams the document
    *    shares with ANY eval document (0 for clean docs; docs shorter
    *    than `n` tokens have no grams and are clean by definition),
    *  - `kept` — 1 when `n_contaminated == 0`, else 0 (the keep-set
    *    predicate a pipeline filters on).
    *
    * Shape at 100 TB: benchmark sets are tiny relative to the corpus
    * (thousands of docs vs billions), so the distinct eval-gram set is
    * BROADCAST — the train side is then one scan-local explode, a
    * broadcast hash join (no shuffle of corpus data against eval data),
    * and a partial-aggregated count keyed by `idCol`. The single
    * corpus-scale shuffle is that per-doc count; the final left join back
    * to `train` is on the same key, so AQE coalesces it into the same
    * exchange. Nothing driver-side touches corpus rows.
    *
    * Real pipelines use n of 8–13 on subword tokens; `n` is a parameter
    * and the default 3 matches this repo's short synthetic documents.
    */
  def decontaminate(train: DataFrame, evalSet: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1, s"decontaminate: n=$n must be >= 1")
    val id = ColNames.quotedCol(idCol)
    val text = ColNames.quotedCol(textCol)
    // Working id name chosen to MISS every caller column (a caller
    // column literally named "_id" used to collide with the fixed name
    // and break the rename-back join).
    val tmpId = Iterator.from(0).map(i => s"_graft_decon_id$i")
      .find(c => !train.columns.contains(c) && c != "gram").get
    // shinglesFromTokens is DISTINCT per document, so the post-join count
    // is "distinct shared grams" with a plain count(*) — no count(distinct).
    val evalGrams = evalSet
      .select(explode(TextOps.shingles(text, n)).as("gram"))
      .distinct()
    val trainGrams = train.select(id.as(tmpId),
      explode(TextOps.shingles(text, n)).as("gram"))
    val hits = trainGrams
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(tmpId))
      .agg(count(lit(1)).as("n_contaminated"))
    train
      .join(hits.withColumnRenamed(tmpId, idCol), Seq(idCol), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("kept", when(col("n_contaminated") === 0, 1).otherwise(0))
  }
}
