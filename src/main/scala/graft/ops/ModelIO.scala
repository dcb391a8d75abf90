package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persistence for the library's trained models — IVF coarse centroids,
  * PQ codebooks, BPE merge tables, perceptron weights — as plain parquet
  * tables, completing the train-once / persist / serve-later lifecycle
  * the reuse parameters (`centroids = Some(...)`, `codebooks`,
  * `merges`, `model`) exist for: train on today's corpus, write the
  * model next to the data, serve tomorrow's batches from any session.
  *
  * Round-trip exactness: every model is doubles/longs/strings in
  * columnar form — parquet stores them bit-exactly, and each loader
  * reorders by the persisted rank/index columns, so `load(save(m)) ≡ m`
  * and serving from a loaded model is result-identical to serving from
  * the in-memory one (spec-pinned). Models are config-sized, so the
  * collect-on-load is the model read, not a data read.
  */
object ModelIO {

  def saveIvfCentroids(spark: SparkSession, path: String,
      cents: Seq[(Int, Array[Double])]): Unit = {
    import spark.implicits._
    cents.map { case (id, c) => (id, c.toSeq) }
      .toDF("list_id", "centroid")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadIvfCentroids(spark: SparkSession, path: String): Seq[(Int, Array[Double])] =
    spark.read.parquet(path)
      .select(col("list_id").cast("int"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq

  def savePqCodebooks(spark: SparkSession, path: String,
      cbs: SimilarityOps.PqCodebooks): Unit = {
    import spark.implicits._
    cbs.flatMap { case (s, words) =>
      words.map { case (j, c) => (s, j, c.toSeq) }
    }.toDF("subspace", "code", "centroid")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadPqCodebooks(spark: SparkSession, path: String): SimilarityOps.PqCodebooks =
    spark.read.parquet(path)
      .select(col("subspace").cast("int"), col("code").cast("int"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, rows) =>
        (s, rows.sortBy(_._2).map { case (_, j, c) => (j, c) }.toSeq)
      }

  def saveBpeMerges(spark: SparkSession, path: String,
      merges: Seq[(String, String, Long)]): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r, c), i) => (i + 1, l, r, c) }
      .toDF("merge_rank", "left_hex", "right_hex", "pair_count")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadBpeMerges(spark: SparkSession, path: String): Seq[(String, String, Long)] =
    spark.read.parquet(path)
      .select(col("merge_rank").cast("int"), col("left_hex"),
        col("right_hex"), col("pair_count").cast("long"))
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq

  def savePerceptron(spark: SparkSession, path: String,
      model: ClassifierOps.PerceptronModel): Unit = {
    import spark.implicits._
    // bucket −1 is the bias (weights(0)); parameters ride every row so
    // the loader needs no side file.
    model.weights.zipWithIndex.toSeq
      .map { case (w, i) => (i - 1, w, model.numBuckets, model.steps, model.learningRate) }
      .toDF("bucket", "weight", "num_buckets", "steps", "learning_rate")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadPerceptron(spark: SparkSession, path: String): ClassifierOps.PerceptronModel = {
    val rows = spark.read.parquet(path)
      .select(col("bucket").cast("int"), col("weight"),
        col("num_buckets").cast("int"), col("steps").cast("int"),
        col("learning_rate"))
      .collect()
    require(rows.nonEmpty, s"loadPerceptron: empty model at $path")
    val numBuckets = rows.head.getInt(2)
    val weights = new Array[Double](numBuckets + 1)
    rows.foreach(r => weights(r.getInt(0) + 1) = r.getDouble(1))
    ClassifierOps.PerceptronModel(weights, numBuckets,
      rows.head.getInt(3), rows.head.getDouble(4))
  }

  /** DSIR bucket model ([[CurationOps.trainDsirModel]]) — the one family
    * that stays a DataFrame end-to-end: `lam` is decimal(18,12) (parquet
    * stores decimals bit-exactly) and [[CurationOps.dsirScore]] consumes
    * the frame directly, so the loader needs NO driver collect at all.
    * `buckets`/`salt` are the caller's serving parameters (they define
    * the hash feature space and must match training).
    */
  def saveDsirModel(path: String, model: org.apache.spark.sql.DataFrame): Unit =
    model.select(col("bk").cast("long"), col("lam").cast("decimal(18,12)"))
      .repartition(1).write.mode("overwrite").parquet(path)

  def loadDsirModel(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(path)
      .select(col("bk").cast("long"), col("lam").cast("decimal(18,12)"))

  /** Persist a [[DedupOps.DedupRefIndex]] — the incremental-dedup
    * reference index (lexical shingle reps or semantic vector reps).
    * Unlike the config-sized models above this is CORPUS-SIZED state:
    * both tables are written distributed and the loader returns plain
    * DataFrames — no driver materialization in either direction. The
    * continuous-ingest lifecycle: build the index on today's corpus,
    * save it next to the data, and serve every subsequent batch via
    * `jaccardPairsAgainstIndex` / `embeddingPairsAgainstIndex` from the
    * loaded tables instead of re-deriving the whole reference per batch.
    */
  def saveRefIndex(path: String, index: DedupOps.DedupRefIndex): Unit = {
    val spark = index.reps.sparkSession
    import spark.implicits._
    index.reps.write.mode("overwrite").parquet(s"$path/reps")
    index.members.write.mode("overwrite").parquet(s"$path/members")
    // One-row metadata: the build parameters a serve call must match
    // (axis, shingleN — a 5-gram index served at 3-gram silently matches
    // nothing) and the build-time priced constants — the class-size max
    // (expansion switch) and, on the lexical axis, the posting total
    // (serve-join sizing) — so loaded indexes pay NO per-batch corpus
    // aggregate at serve (r21). Computed from the WRITTEN reps table in
    // one job, so they price the persisted artifact, not a recomputation
    // of the build lineage. Semantic postings is the −1 "absent" marker.
    val pricedRow = spark.read.parquet(s"$path/reps")
      .agg(coalesce(max(col("cnt")), lit(1L)).cast("long"),
        (if (index.axis == "lexical")
           coalesce(sum(size(col("sh"))), lit(0L)) else lit(-1L))
          .cast("long")).head()
    Seq((index.axis, index.shingleN.map(_.toLong).getOrElse(-1L),
        pricedRow.getLong(0), pricedRow.getLong(1)))
      .toDF("axis", "shingle_n", "max_class", "postings")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadRefIndex(spark: SparkSession, path: String): DedupOps.DedupRefIndex = {
    val meta = spark.read.parquet(s"$path/meta")
    // Pre-r21 saves carry no postings column; load them as unpriced
    // (the serve then runs its one-job union pricing).
    val withPostings = meta.columns.contains("postings")
    val m = meta.select(col("axis"), col("shingle_n").cast("long"),
      col("max_class").cast("long"),
      (if (withPostings) col("postings") else lit(-1L)).cast("long")).head()
    DedupOps.DedupRefIndex(
      spark.read.parquet(s"$path/reps"),
      spark.read.parquet(s"$path/members").select(col("fp"), col("id")),
      axis = m.getString(0),
      shingleN = Some(m.getLong(1)).filter(_ >= 0).map(_.toInt),
      maxClass = Some(m.getLong(2)),
      postings = Some(m.getLong(3)).filter(_ >= 0))
  }

  /** Persist a [[SimilarityOps.PqIndex]] — the encode-once/serve-many
    * ANN artifact: the encoded corpus is CORPUS-SIZED (written
    * distributed, loaded as a plain scan), the quantizer models are
    * config-sized. Meta (dims, m — the parameters a serve must match)
    * is written LAST as the commit marker, so a save interrupted
    * mid-write has no meta and [[loadPqIndex]] fails loudly instead of
    * serving a torn index. */
  def savePqIndex(path: String, index: SimilarityOps.PqIndex): Unit = {
    val spark = index.encoded.sparkSession
    import spark.implicits._
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(metaPath, true)
    index.encoded.write.mode("overwrite").parquet(s"$path/encoded")
    saveIvfCentroids(spark, s"$path/centroids", index.centroids)
    savePqCodebooks(spark, s"$path/codebooks", index.codebooks)
    Seq((index.dims.toLong, index.m.toLong)).toDF("dims", "m")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadPqIndex(spark: SparkSession, path: String): SimilarityOps.PqIndex = {
    val meta = spark.read.parquet(s"$path/meta")
      .select(col("dims").cast("long"), col("m").cast("long")).head()
    SimilarityOps.PqIndex(
      spark.read.parquet(s"$path/encoded")
        .select(col("list_id"), col("vec_id"), col("codes")),
      loadIvfCentroids(spark, s"$path/centroids"),
      loadPqCodebooks(spark, s"$path/codebooks"),
      dims = meta.getLong(0).toInt, m = meta.getLong(1).toInt)
  }
}
