package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSuite {
  import spark.implicits._

  // 90% of rows share one hot key — the shape salting exists for.
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) 1L else i.toLong % 7, i.toLong, s"v$i")
  }.toDF("k", "id", "payload")

  private def dim = Seq((1L, "hot"), (2L, "b"), (3L, "c"), (0L, "z"))
    .toDF("dk", "name")

  test("saltedJoin equals the plain equi-join under skew") {
    val got = ScaleOps.saltedJoin(skewed, dim, "k", "dk", saltBy = $"id", salt = 8)
      .select("k", "id", "name").orderBy("k", "id")
      .as[(Long, Long, String)].collect().toSeq
    val want = skewed.join(dim, $"k" === $"dk")
      .select("k", "id", "name").orderBy("k", "id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == want && want.size > 900, s"got ${got.size} vs ${want.size}")
  }

  test("saltedJoin spreads the hot key across all salt shards") {
    // Asserts on ScaleOps.saltExpr — the exact expression saltedJoin
    // salts with — so a change to the salting formula cannot pass via a
    // drifted inline copy of it.
    val salted = skewed.withColumn("_s", ScaleOps.saltExpr($"id", 8))
    val shards = salted.filter($"k" === 1L).select("_s").distinct().count()
    assert(shards == 8L, s"hot key used only $shards of 8 shards")
  }

  test("saltedJoin keeps rows whose saltBy value is null") {
    val l = Seq((1L, java.lang.Long.valueOf(10L)), (2L, null.asInstanceOf[java.lang.Long]))
      .toDF("k", "sb")
    val r = Seq((1L, "a"), (2L, "b")).toDF("dk", "name")
    val got = ScaleOps.saltedJoin(l, r, "k", "dk", saltBy = $"sb", salt = 4)
      .select("k", "name").orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b")), s"null saltBy must not drop rows: $got")
  }

  test("saltedCountSum equals the direct aggregation") {
    val df = skewed.withColumn("x", ($"id" % 100).cast("double"))
    val got = ScaleOps.saltedCountSum(df, "k", "sum(x)", saltBy = $"id", salt = 8)
      .select("k", "n", "s").orderBy("k")
      .as[(Long, Long, Double)].collect().toSeq
    val want = df.groupBy("k").agg(count(lit(1)).as("n"), sum("x").as("s"))
      .select("k", "n", "s").orderBy("k")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._3 - w._3) < 1e-6) }
  }
}
