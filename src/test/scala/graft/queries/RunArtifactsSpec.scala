package graft.queries

import graft.SparkSuite

/** Pins the run-artifact sharing semantics (SURVEY §8 round 13): a
  * session materializes each expensive artifact once per input dir, a
  * second consumer reads the same artifact, and clearRunArtifacts
  * forces a rebuild — the contract the plan-shape specs and the warm
  * bench figures rest on.
  */
class RunArtifactsSpec extends SparkSuite {

  test("second invocation serves from the run artifact; clear forces a rebuild") {
    GraftQueries.clearRunArtifacts()
    def run() = GraftQueries.queries("dedup_components")(spark, sf())
    val first = run()
    val second = run()
    // Same memoized labeling: both plans scan the SAME checkpointed RDD.
    def rddScan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.collectLeaves().mkString
    assert(rddScan(first) == rddScan(second),
      "second invocation rebuilt the component labeling instead of " +
        "reading the run artifact")
    // Rebuild after clear: a different checkpoint incarnation...
    GraftQueries.clearRunArtifacts()
    val third = run()
    assert(rddScan(first) != rddScan(third),
      "clearRunArtifacts did not force a rebuild")
    // ...with identical values (determinism — the property that makes
    // sharing value-invisible).
    val a = first.collect().map(_.toSeq)
    val c = third.collect().map(_.toSeq)
    assert(a.sameElements(c), "rebuilt labeling diverged from the original")
  }
}
