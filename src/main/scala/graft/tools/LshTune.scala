package graft.tools

import graft.Sessions
import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._

/** Offline tuning grid for the hyperplane-LSH top-k parameters:
  * recall@5 vs brute force and candidate volume per (bits, tables) on a
  * given sf dir — the measurement behind the registered sim_topk_lsh
  * configuration. Usage: runMain graft.tools.LshTune <sfDir>
  */
object LshTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id"), col("embedding").as("cv"))
    val brute = SimilarityOps.bruteForceTopK(q, c, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bits <- Seq(4, 6, 8, 10, 12); tables <- Seq(4, 8, 16)) {
      val t0 = System.nanoTime()
      val got = SimilarityOps.lshTopK(q, c, k = 5, bits = bits, tables = tables)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = got.intersect(brute).size.toDouble / brute.size
      println(f"[lsh-tune] bits=$bits%2d tables=$tables%2d recall@5=$recall%.3f rows=${got.size}%4d  $sec%5.2f s")
    }
    spark.stop()
  }
}
