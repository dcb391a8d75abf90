package graft.tools

import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the winnow-pairs pipeline. */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val fps = TextOps.winnowFingerprints(docs)
      .select(col("doc_id").as("id"), explode(col("winnow_fps")).as("fp"))
    fps.persist()
    t("fps materialize")(println("  fps rows: " + fps.count()))
    val cands = fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("_shared"))
      .filter(col("_shared") >= 2)
      .select("doc_a", "doc_b")
    cands.persist()
    t("candidates")(println("  cand rows: " + cands.count()))
    val base = docs.select(col("doc_id").as("id"),
      TextOps.shinglesFromTokens(TextOps.tokens(col("text")), 3).as("sh"))
    base.persist()
    t("base materialize")(println("  base rows: " + base.count()))
    val verified = cands
      .join(base.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(base.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .filter(col("jaccard") >= 0.5)
    t("verify")(println("  pairs: " + verified.count()))
    spark.stop()
  }
}
