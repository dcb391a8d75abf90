package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

import java.nio.file.Files

class ModelIOSpec extends SparkSuite {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("model").toString

  test("all four model families round-trip parquet bit-exactly") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val corpus = emb.select(col("vec_id"), col("embedding").as("cv"))

    val cents = SimilarityOps.trainIvfCentroids(corpus, nlist = 4,
      trainIters = 2, trainFraction = 1.0)
    val pc = tmpDir("modelio-ivf")
    ModelIO.saveIvfCentroids(spark, pc, cents)
    val cents2 = ModelIO.loadIvfCentroids(spark, pc)
    assert(cents2.map { case (i, c) => (i, c.toSeq) } ==
      cents.map { case (i, c) => (i, c.toSeq) })

    val books = SimilarityOps.trainPqCodebooks(corpus, dims = 64, m = 4,
      ksub = 4, trainIters = 2, trainFraction = 1.0)
    val pb = tmpDir("modelio-pq")
    ModelIO.savePqCodebooks(spark, pb, books)
    val books2 = ModelIO.loadPqCodebooks(spark, pb)
    assert(books2.map { case (s, ws) => (s, ws.map { case (j, c) => (j, c.toSeq) }) } ==
      books.map { case (s, ws) => (s, ws.map { case (j, c) => (j, c.toSeq) }) })

    val merges = TextOps.trainBpeMerges(docs, numMerges = 4)
    val pm = tmpDir("modelio-bpe")
    ModelIO.saveBpeMerges(spark, pm, merges)
    assert(ModelIO.loadBpeMerges(spark, pm) == merges)

    val docsLab = docs.withColumn("lab", col("doc_id") % 2 === 0)
    val percep = ClassifierOps.trainPerceptron(docsLab, "lab",
      numBuckets = 32, steps = 1)
    val pp = tmpDir("modelio-percep")
    ModelIO.savePerceptron(spark, pp, percep)
    val percep2 = ModelIO.loadPerceptron(spark, pp)
    assert(percep2.weights.toSeq == percep.weights.toSeq &&
      percep2.numBuckets == percep.numBuckets &&
      percep2.steps == percep.steps &&
      percep2.learningRate == percep.learningRate)
  }

  test("serving from a loaded model is result-identical to the in-memory model") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val corpus = emb.select(col("vec_id"), col("embedding").as("cv"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cents = SimilarityOps.trainIvfCentroids(corpus, nlist = 4,
      trainIters = 2, trainFraction = 1.0)
    val p = tmpDir("modelio-serve")
    ModelIO.saveIvfCentroids(spark, p, cents)
    val fromMem = SimilarityOps.ivfTopK(queries, corpus, k = 3, nlist = 4,
      nprobe = 2, centroids = Some(cents)).collect().toSeq
    val fromDisk = SimilarityOps.ivfTopK(queries, corpus, k = 3, nlist = 4,
      nprobe = 2, centroids = Some(ModelIO.loadIvfCentroids(spark, p)))
      .collect().toSeq
    assert(fromMem.nonEmpty && fromDisk == fromMem)
  }

  test("DSIR model round-trips and scoring from disk is bit-identical") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val target = docs.filter(col("lang") === "en")
    val model = CurationOps.trainDsirModel(docs, target, buckets = 32)
    val p = tmpDir("modelio-dsir")
    ModelIO.saveDsirModel(p, model)
    val loaded = ModelIO.loadDsirModel(spark, p)
    // model itself round-trips exactly (decimal lam, long bk)
    assert(loaded.orderBy("bk").collect().map(_.toSeq).toSeq ==
      model.orderBy("bk").collect().map(_.toSeq).toSeq)
    // serving tomorrow's batch from the persisted model ≡ the one-shot
    // composed path on the same (docs, target)
    val direct = CurationOps.dsirLogWeights(docs, target, buckets = 32)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val served = CurationOps.dsirScore(docs, loaded, buckets = 32)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(served.nonEmpty && served == direct)
  }

  test("dedup reference index round-trips; batches served from disk are identical") {
    // The continuous-ingest artifact: build the reference index once,
    // persist it, and serve a batch from the LOADED index — results must
    // equal the convenience against-Ref form that re-derives the
    // reference per call, on both the lexical and semantic axes.
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet

    val jp = tmpDir("modelio-jidx")
    // materialized = true: the save path's documented build mode (pins
    // the keyed corpus pass so the two table writes share one lineage).
    ModelIO.saveRefIndex(jp, DedupOps.buildJaccardRefIndex(ref,
      materialized = true))
    val jLoaded = ModelIO.loadRefIndex(spark, jp)
    // The meta round-trips: axis, build shingleN, build-time class max.
    assert(jLoaded.axis == "lexical" && jLoaded.shingleN.contains(3))
    assert(jLoaded.maxClass.exists(_ >= 1L))
    val jServed = DedupOps.jaccardPairsAgainstIndex(batch, jLoaded,
      threshold = 0.5)
    val jDirect = DedupOps.jaccardPairsAgainstRef(batch, ref, threshold = 0.5)
    assert(rows(jServed) == rows(jDirect))
    assert(rows(jDirect).nonEmpty, "fixture produced no lexical pairs")
    // Parameter-mismatch serves fail LOUDLY, not with silent empties.
    intercept[IllegalArgumentException] { // built at 3-grams, served at 5
      DedupOps.jaccardPairsAgainstIndex(batch, jLoaded,
        threshold = 0.5, shingleN = 5)
    }
    intercept[IllegalArgumentException] { // lexical index into semantic op
      DedupOps.embeddingPairsAgainstIndex(
        spark.read.parquet(s"${sf()}/embeddings.parquet"), jLoaded,
        threshold = 0.4, dims = 64)
    }

    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val refE = emb.filter(col("vec_id") % 2 === 0)
    val batchE = emb.filter(col("vec_id") % 2 === 1)
    val ep = tmpDir("modelio-eidx")
    ModelIO.saveRefIndex(ep, DedupOps.buildEmbeddingRefIndex(refE))
    val eServed = DedupOps.embeddingPairsAgainstIndex(batchE,
      ModelIO.loadRefIndex(spark, ep), threshold = 0.4, dims = 64)
    val eDirect = DedupOps.embeddingPairsAgainstRef(batchE, refE,
      threshold = 0.4, dims = 64)
    assert(rows(eServed) == rows(eDirect))
    assert(rows(eDirect).nonEmpty, "fixture produced no semantic pairs")
  }
}
