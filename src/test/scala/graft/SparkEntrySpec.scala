package graft

/** The driver contract itself (SparkEntry): the flagship smoke check the
  * driver runs, and the structural invariants the correctness harness
  * assumes — every oracle key names a registered query, and the four
  * documented rows-only entries are exactly the queries without oracles.
  */
class SparkEntrySpec extends SparkSuite {

  test("entry: flagship query returns rows on sf0.001 (the driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query; rows-only set is exactly the ANN paths") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("sim_topk_lsh", "sim_topk_ivf",
      "sim_topk_ivf_q8", "sim_topk_ivfpq"),
      s"unexpected rows-only (weaker-checked) queries: $rowsOnly — every " +
        "new operator needs BOTH a queries entry and an oracleSql entry " +
        "unless it is a documented approximate path")
  }
}
