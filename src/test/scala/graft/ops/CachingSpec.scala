package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The reliable-checkpoint seam ([[Caching.materialize]]): with
  * `spark.graft.checkpointDir` set, every op's eager materialization
  * writes a RELIABLE checkpoint under that path (cluster-survivable)
  * instead of executor-local blocks — with identical results. A chained
  * pipeline op runs under both modes and must agree row-for-row.
  */
class CachingSpec extends SparkSuite {
  import spark.implicits._

  test("spark.graft.checkpointDir switches ops to reliable checkpoints, results identical") {
    // dedupParagraphsAgainstRef routes through Caching.withCached → the
    // materialize seam (dedupParagraphsACROSSDocs does not — it has no
    // intermediate to pin).
    val refFps = TextOps.paragraphFingerprints(
      Seq((100L, Seq("COOKIE BANNER"))).toDF("doc_id", "paras"))
    val docs = Seq(
      (1L, Seq("COOKIE BANNER", "unique one")),
      (2L, Seq("COOKIE BANNER", "unique two")),
      (3L, Seq("unique two", "unique three"))
    ).toDF("doc_id", "paras")
    def run(): Array[(Long, Long, String)] =
      TextOps.dedupParagraphsAgainstRef(docs, refFps)
        .select(col("doc_id"), col("n_kept"), col("text_deduped"))
        .orderBy("doc_id")
        .as[(Long, Long, String)].collect()
    val local = run()
    val dir = tmp("graft-reliable-ckpt")
    spark.conf.set(Caching.CheckpointDirKey, dir)
    try {
      val reliable = run()
      assert(reliable.sameElements(local),
        s"reliable-checkpoint run diverged: ${reliable.toSeq} vs ${local.toSeq}")
      // The materialization really went through the reliable path: the
      // session's checkpoint dir landed under the configured root and
      // checkpoint data exists there.
      val ckptDir = spark.sparkContext.getCheckpointDir
      assert(ckptDir.exists(_.contains(new java.io.File(dir).getName)),
        s"checkpoint dir $ckptDir not under configured root $dir")
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, s"no checkpoint files written under $dir")
    } finally spark.conf.unset(Caching.CheckpointDirKey)
  }
}
