package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ClassifierOpsSpec extends SparkSuite {

  test("perceptron converges to 100% on linearly separable vocabularies") {
    import spark.implicits._
    // Two disjoint vocabularies: separable, so full-batch perceptron must
    // reach zero misclassifications (early-stop) within a few steps.
    val pos = Seq("good fine great nice solid", "fine great good good nice",
      "solid nice fine great fine", "great solid good nice fine")
    val neg = Seq("bad poor awful broken weak", "poor awful bad bad broken",
      "weak broken poor awful poor", "awful weak bad broken poor")
    val docs = (pos.map((_, true)) ++ neg.map((_, false))).zipWithIndex
      .map { case ((t, l), i) => (i.toLong, t, l) }
      .toDF("doc_id", "text", "lab")
    val model = ClassifierOps.trainPerceptron(docs, "lab",
      numBuckets = 64, steps = 10)
    val scored = ClassifierOps.scorePerceptron(docs, model, "lab")
    assert(scored.filter(!col("correct")).count() == 0,
      "separable fixture must classify perfectly")
  }

  test("registered config beats majority class on real docs; model is deterministic") {
    val tk = TextOps.tokens(col("text"))
    val enStops = Seq("the", "a", "of", "and", "is", "to")
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .withColumn("is_quality",
        size(filter(tk, x => x.isin(enStops: _*))).cast("double")
          / size(tk).cast("double") >= 0.06)
    val model = ClassifierOps.trainPerceptron(docs, "is_quality",
      numBuckets = 256, steps = 1)
    val scored = ClassifierOps.scorePerceptron(docs, model, "is_quality")
    val n = scored.count().toDouble
    val acc = scored.filter(col("correct")).count() / n
    val majority = math.max(
      scored.filter(col("label")).count() / n,
      scored.filter(!col("label")).count() / n)
    assert(acc > majority,
      s"accuracy $acc must beat the majority baseline $majority")
    assert(acc >= 0.8, s"accuracy $acc below the Rocchio-pass floor")
    // Bit-identical model under repartitioning (the decimal-sum
    // determinism contract).
    val again = ClassifierOps.trainPerceptron(docs.repartition(7), "is_quality",
      numBuckets = 256, steps = 1)
    assert(model.weights.toSeq == again.weights.toSeq)
  }

  test("class-balanced gradient: step-1 is the Rocchio centroid difference") {
    import spark.implicits._
    // Reference: w_j = mean over positives of x_j minus mean over
    // negatives of x_j (bias = 1 - 1 = 0 from the constant feature).
    val docs = Seq(
      (1L, "aa aa bb", true), (2L, "aa cc cc", true),
      (3L, "dd dd bb", false), (4L, "dd cc dd", false),
      (5L, "aa bb cc", true)
    ).toDF("doc_id", "text", "lab")
    val model = ClassifierOps.trainPerceptron(docs, "lab",
      numBuckets = 16, steps = 1)
    def bucket(w: String): Int =
      java.lang.Long.remainderUnsigned(
        java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(w).substring(0, 15), 16),
        16L).toInt
    val rows = docs.collect().map(r => (r.getString(1).split(" "), r.getBoolean(2)))
    val want = new Array[Double](17)
    val nPos = rows.count(_._2); val nNeg = rows.length - nPos
    rows.foreach { case (ws, lab) =>
      val n = ws.length.toDouble
      val y = if (lab) 1 else -1
      val ny = if (lab) nPos else nNeg
      want(0) += y * 1.0 / ny
      ws.groupBy(bucket).foreach { case (b, g) =>
        want(b + 1) += y * (g.length / n) / ny
      }
    }
    model.weights.zip(want).zipWithIndex.foreach { case ((got, w), i) =>
      assert(math.abs(got - w) < 1e-9, s"weight $i: got $got want $w")
    }
  }
}
