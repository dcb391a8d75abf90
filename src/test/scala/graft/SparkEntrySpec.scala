package graft

/** The driver contract itself (SparkEntry): the flagship smoke check the
  * driver runs, and the structural invariants the correctness harness
  * assumes — every oracle key names a registered query, and every
  * registered query has an oracle (the last rows-only holdouts, the four
  * ANN paths, went value-exact via model dump-and-replay in r16).
  */
class SparkEntrySpec extends SparkSuite {

  test("entry: flagship query returns rows on sf0.001 (the driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query, and vice versa (no rows-only queries)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"rows-only (weaker-checked) queries: $rowsOnly — every operator " +
        "needs BOTH a queries entry and an oracleSql entry; approximate " +
        "paths get a value-exact oracle via model dump-and-replay " +
        "(the sim_topk_* pattern)")
  }
}
