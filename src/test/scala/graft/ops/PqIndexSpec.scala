package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The IVF-PQ index lifecycle (SURVEY §8 round 15): encode-once /
  * serve-many. [[SimilarityOps.ivfTopKPq]] re-encodes the corpus inside
  * every call; [[SimilarityOps.buildPqIndex]] pays that corpus-linear
  * pass once, [[SimilarityOps.ivfTopKPqIndexed]] serves every
  * subsequent query batch from the stored codes, [[ModelIO.savePqIndex]]
  * persists the artifact across sessions, and
  * [[SimilarityOps.appendToPqIndex]] grows it between epochs under
  * FROZEN models. Every serve below must be result-IDENTICAL to the
  * inline-encode call: encoding is a deterministic per-row map under
  * fixed models, so when it runs cannot change any score.
  */
class PqIndexSpec extends SparkSuite {

  private val dims = 16
  private val m = 4
  private val ksub = 8

  private def corpus: DataFrame = {
    import spark.implicits._
    Seq.tabulate(48)(i =>
      (i.toLong, Seq.tabulate(dims)(d => math.sin(i * 17 + d * 3).toFloat)))
      .toDF("vec_id", "cv")
  }

  private def queries: DataFrame = {
    import spark.implicits._
    Seq.tabulate(6)(i =>
      (100L + i, Seq.tabulate(dims)(d => math.cos(i * 11 + d * 5).toFloat)))
      .toDF("query_id", "qv")
  }

  private def models(c: DataFrame) = (
    SimilarityOps.trainIvfCentroids(c, nlist = 4, trainIters = 5,
      trainFraction = 1.0),
    SimilarityOps.trainPqCodebooks(c, dims = dims, m = m, ksub = ksub,
      trainIters = 5, trainFraction = 1.0))

  private def rows(df: DataFrame): Set[(Long, Int, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
      r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet

  private def encRows(df: DataFrame): Set[(Int, Long, Seq[Byte])] =
    df.collect().map(r => (r.getAs[Int]("list_id"), r.getAs[Long]("vec_id"),
      r.getAs[Seq[Byte]]("codes"))).toSet

  test("serve from a built index ≡ the inline-encode call") {
    val c = corpus
    val (cents, cbs) = models(c)
    val direct = rows(SimilarityOps.ivfTopKPq(queries, c, k = 3,
      dims = dims, nlist = 4, nprobe = 2, m = m, ksub = ksub,
      excludeSelf = false, rerank = 4,
      centroids = Some(cents), codebooks = Some(cbs)))
    val idx = SimilarityOps.buildPqIndex(c, dims = dims, nlist = 4,
      m = m, ksub = ksub, centroids = Some(cents), codebooks = Some(cbs))
    val served = rows(SimilarityOps.ivfTopKPqIndexed(queries, idx, c,
      k = 3, nprobe = 2, excludeSelf = false, rerank = 4))
    assert(served == direct, s"indexed serve $served != direct $direct")
    assert(direct.nonEmpty)
  }

  test("ModelIO round-trip serves identically; a torn save fails loudly") {
    val c = corpus
    val (cents, cbs) = models(c)
    val idx = SimilarityOps.buildPqIndex(c, dims = dims, nlist = 4,
      m = m, ksub = ksub, centroids = Some(cents), codebooks = Some(cbs),
      materialized = true)
    val path = tmp("pq-index")
    ModelIO.savePqIndex(path, idx)
    val loaded = ModelIO.loadPqIndex(spark, path)
    assert(loaded.dims == dims && loaded.m == m)
    assert(loaded.centroids.map { case (i, a) => (i, a.toSeq) } ==
      idx.centroids.map { case (i, a) => (i, a.toSeq) })
    assert(loaded.codebooks.map { case (s, ws) =>
        (s, ws.map { case (j, arr) => (j, arr.toSeq) })
      } == idx.codebooks.map { case (s, ws) =>
        (s, ws.map { case (j, arr) => (j, arr.toSeq) })
      })
    assert(encRows(loaded.encoded) == encRows(idx.encoded))
    val direct = rows(SimilarityOps.ivfTopKPqIndexed(queries, idx, c,
      k = 3, nprobe = 2, excludeSelf = false))
    val served = rows(SimilarityOps.ivfTopKPqIndexed(queries, loaded, c,
      k = 3, nprobe = 2, excludeSelf = false))
    assert(served == direct)
    // Torn save: the meta commit marker is missing → load fails loudly
    // instead of serving a half-written index.
    val fsPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(fsPath, true)
    intercept[Exception] { ModelIO.loadPqIndex(spark, path) }
  }

  test("an index built on an empty corpus serves the standard empty result") {
    val empty = corpus.limit(0)
    val idx = SimilarityOps.buildPqIndex(empty, dims = dims, nlist = 4,
      m = m, ksub = ksub)
    assert(idx.encoded.count() == 0)
    val served = SimilarityOps.ivfTopKPqIndexed(queries, idx, empty, k = 3,
      nprobe = 2, excludeSelf = false)
    assert(served.count() == 0)
    assert(served.columns.toSeq ==
      Seq("query_id", "rank", "neighbor_id", "cosine"))
  }

  test("serving against a truncated corpus fails loudly (generation mismatch)") {
    val c = corpus
    val (cents, cbs) = models(c)
    val idx = SimilarityOps.buildPqIndex(c, dims = dims, nlist = 4,
      m = m, ksub = ksub, centroids = Some(cents), codebooks = Some(cbs))
    // A corpus missing rows the index encoded — e.g. serving yesterday's
    // vector table against today's appended index. The re-rank fetch
    // must raise naming the missing vec_id, not silently drop it.
    val truncated = c.filter(col("vec_id") < 24)
    val e = intercept[Exception] {
      SimilarityOps.ivfTopKPqIndexed(queries, idx, truncated, k = 3,
        nprobe = 2, excludeSelf = false, rerank = 4).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c2 => Option(c2.getMessage)).getOrElse("")
    assert(msg.contains("generation mismatch"),
      s"expected a loud generation-mismatch error, got: $e")
    // The guard costs nothing when generations line up: the full corpus
    // still serves identically to the unguarded inline-encode call.
    val served = rows(SimilarityOps.ivfTopKPqIndexed(queries, idx, c,
      k = 3, nprobe = 2, excludeSelf = false, rerank = 4))
    val direct = rows(SimilarityOps.ivfTopKPq(queries, c, k = 3,
      dims = dims, nlist = 4, nprobe = 2, m = m, ksub = ksub,
      excludeSelf = false, rerank = 4,
      centroids = Some(cents), codebooks = Some(cbs)))
    assert(served == direct)
  }

  test("append(build(A), B) ≡ build(A ∪ B) under the frozen models") {
    val c = corpus
    val (cents, cbs) = models(c)
    val evens = c.filter(col("vec_id") % 2 === 0)
    val odds = c.filter(col("vec_id") % 2 =!= 0)
    val appended = SimilarityOps.appendToPqIndex(
      SimilarityOps.buildPqIndex(evens, dims = dims, nlist = 4, m = m,
        ksub = ksub, centroids = Some(cents), codebooks = Some(cbs)),
      odds, materialized = true)
    val full = SimilarityOps.buildPqIndex(c, dims = dims, nlist = 4,
      m = m, ksub = ksub, centroids = Some(cents), codebooks = Some(cbs))
    assert(encRows(appended.encoded) == encRows(full.encoded),
      "appended encoding differs from the one-shot encode")
    val served = rows(SimilarityOps.ivfTopKPqIndexed(queries, appended, c,
      k = 3, nprobe = 2, excludeSelf = false))
    val oneShot = rows(SimilarityOps.ivfTopKPqIndexed(queries, full, c,
      k = 3, nprobe = 2, excludeSelf = false))
    assert(served == oneShot)
  }
}
