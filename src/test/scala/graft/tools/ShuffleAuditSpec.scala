package graft.tools

import graft.SparkSuite

/** Wires the byte-metric audit into `sbt test` at sf0.001: the machinery
  * (task-metric tally, settle/delta windows, steady-state second-run
  * measurement, enforcement math) runs end-to-end; ratio and zero-spill
  * ENFORCEMENT at scale belongs to the CLI runs at sf0.1×10 — same
  * division of labor as LinearProbeSpec/ScaleProbeSpec.
  */
class ShuffleAuditSpec extends SparkSuite {

  test("audit runs end-to-end and attributes per-query byte deltas") {
    val results = ShuffleAudit.run(spark, sf(), scaledDir = None, factor = 10,
      Seq("q01_pricing_summary", "curate_semdedup", "dedup_jaccard_exact"))
    assert(results.size == 3)
    // A group-by over lineitem must write shuffle bytes; the delta
    // windows must not smear them across queries (each query gets SOME
    // attribution, and none is negative).
    val byName = results.map(r => r.query -> r.base).toMap
    assert(byName("q01_pricing_summary").shuffleWrite > 0)
    results.foreach { r =>
      assert(r.base.shuffleWrite >= 0 && r.base.diskSpill >= 0, r.toString)
    }
    // The semantic carry-through family must not spill at ANY scale —
    // sf0.001 included.
    val sem = results.find(_.query == "curate_semdedup").get
    assert(sem.zeroSpillEnforced && sem.spillOk,
      s"semdedup spilled ${sem.base.diskSpill} bytes at sf0.001")
  }

  test("enforcement math: spill gate and ratio floor/slack") {
    import ShuffleAudit._
    val m0 = Metrics(0, 0, 0, 0, 0)
    // Zero-spill family: any disk spill on either side is a breach.
    val spilled = Audit("curate_semdedup", m0.copy(diskSpill = 1), None, 10)
    assert(!spilled.spillOk && !spilled.ok)
    val clean = Audit("curate_semdedup", m0, Some(m0), 10)
    assert(clean.spillOk && clean.ok)
    // Non-enforced query may spill without breaching.
    assert(Audit("q01_pricing_summary", m0.copy(diskSpill = 5), None, 10).ok)
    // Ratio: enforced only at/above the signal floor, bound factor×Slack.
    val base = Metrics(MinSignalBytes, 0, 0, 0, 0)
    val okRatio = Audit("q", base, Some(Metrics((MinSignalBytes * 10 * Slack).toLong - 1, 0, 0, 0, 0)), 10)
    assert(okRatio.ratioEnforced && okRatio.ok)
    val breach = Audit("q", base, Some(Metrics((MinSignalBytes * 10 * Slack).toLong + 1, 0, 0, 0, 0)), 10)
    assert(breach.ratioEnforced && !breach.ok)
    val floored = Audit("q", Metrics(MinSignalBytes - 1, 0, 0, 0, 0),
      Some(Metrics(MinSignalBytes * 100, 0, 0, 0, 0)), 10)
    assert(!floored.ratioEnforced && floored.ok)
  }

  test("enforcement math: record gate and the rows-linear byte WARN band") {
    import ShuffleAudit._
    def m(bytes: Long, rows: Long) = Metrics(bytes, 0, 0, 0, rows)
    val f = 10
    // Record breach is a failure even when bytes are linear (a
    // super-linear candidate stream of highly-compressible rows).
    val rowBreach = Audit("q", m(MinSignalBytes, MinSignalRecords),
      Some(m(MinSignalBytes * f, (MinSignalRecords * f * RowSlack).toLong + 1)), f)
    assert(rowBreach.rowEnforced && !rowBreach.rowOk && !rowBreach.ok)
    // Bytes past Slack, rows linear, NO per-exchange evidence -> the
    // per-bucket-compression band passes the sweep but as an explicit
    // WARN (ADVICE r19 #4: r19 silently widened the whole registry).
    val warned = Audit("q", m(MinSignalBytes, MinSignalRecords),
      Some(m((MinSignalBytes * f * 1.4).toLong, MinSignalRecords * f)), f)
    assert(warned.rowEnforced && warned.rowOk && warned.byteWarn && warned.ok)
    // Same crossing WITH matched per-exchange stats, every above-floor
    // exchange linear -> composition-adjudicated PASS, not a WARN.
    val adjudicated = warned.copy(
      baseEx = Seq(ExchangeStat("Exchange", MinSignalBytes, MinSignalRecords)),
      scaledEx = Some(Seq(ExchangeStat("Exchange", MinSignalBytes * f, MinSignalRecords * f))))
    assert(adjudicated.compositionBytesOk.contains(true) &&
      !adjudicated.byteWarn && adjudicated.ok)
    // Bytes past even WideByteSlack fail regardless of linear rows.
    val farBreach = Audit("q", m(MinSignalBytes, MinSignalRecords),
      Some(m((MinSignalBytes * f * (WideByteSlack + 0.1)).toLong, MinSignalRecords * f)), f)
    assert(farBreach.rowEnforced && farBreach.rowOk && !farBreach.ratioOk && !farBreach.ok)
    // Rows below their signal floor: bytes keep the TIGHT slack (no
    // widening without the compression-immune evidence).
    val noRows = Audit("q", m(MinSignalBytes, MinSignalRecords - 1),
      Some(m((MinSignalBytes * f * 1.4).toLong, (MinSignalRecords - 1) * f)), f)
    assert(!noRows.rowEnforced && !noRows.byteWarn && !noRows.ok)
  }

  test("near-gate composition descent: floor-exempt tails adjudicate, real breaches fail") {
    import ShuffleAudit._
    def m(bytes: Long, rows: Long) = Metrics(bytes, 0, 0, 0, rows)
    val f = 10
    // Synthetic composition artifact (VERDICT r19 #5's fixture, tail
    // bounded per ADVICE r20 #1): one big exchange growing 13.4x plus a
    // floor-exempt tail growing 26x — but staying under the exemption's
    // scaled-side cap floor×factor×RowSlack — pushes the AGGREGATE row
    // ratio past the 13.5 gate; the descent must attribute and PASS it.
    val bigB = ExchangeStat("Exchange", 100L << 20, 100000)
    val tinyB = ExchangeStat("Exchange", 1L << 20, 5000)
    val bigS = ExchangeStat("Exchange", (1000L << 20), 1340000)
    val tinyS = ExchangeStat("Exchange", 3L << 20, 130000)
    assert(tinyS.records < ExchangeRecordFloor * f * RowSlack)
    val aggRows = (bigS.records + tinyS.records).toDouble / (bigB.records + tinyB.records)
    assert(aggRows > f * RowSlack, s"fixture must cross the aggregate gate, got $aggRows")
    val artifact = Audit("q",
      m(bigB.bytes + tinyB.bytes, bigB.records + tinyB.records),
      Some(m(bigS.bytes + tinyS.bytes, bigS.records + tinyS.records)), f,
      baseEx = Seq(bigB, tinyB), scaledEx = Some(Seq(bigS, tinyS)))
    assert(artifact.rowEnforced && !artifact.rowAggregateOk)
    assert(artifact.compositionRowsOk.contains(true) && artifact.rowOk && artifact.ok)
    // A REAL super-linear exchange (the big one at x20) fails the
    // descent — composition cannot launder a genuine breach.
    val breach = artifact.copy(scaledEx = Some(Seq(
      bigS.copy(records = bigB.records * 20), tinyS)))
    assert(breach.compositionRowsOk.contains(false))
    // A just-under-floor exchange growing SUPER-linearly past the
    // exemption's scaled-side cap is a breach, not an exempt tail
    // (ADVICE r20 #1: the unbounded exemption let a quadratic fan-out
    // starting at floor−1 launder a gate crossing as PASS).
    val overrunTail = artifact.copy(scaledEx = Some(Seq(
      bigS, tinyS.copy(records = 500000))))
    assert(overrunTail.compositionRowsOk.contains(false) && !overrunTail.ok)
    // Mismatched executed shapes make no per-exchange claim: the
    // aggregate verdict stands.
    val mismatched = artifact.copy(scaledEx = Some(Seq(bigS)))
    assert(mismatched.matchedExchanges.isEmpty && !mismatched.rowOk && !mismatched.ok)
    // A vacuous or under-covered capture makes no claim either — empty
    // or partial exchange lists must never launder an aggregate breach.
    val vacuous = artifact.copy(baseEx = Nil, scaledEx = Some(Nil))
    assert(vacuous.matchedExchanges.isEmpty && !vacuous.rowOk && !vacuous.ok)
    val underCovered = artifact.copy(
      baseEx = Seq(tinyB), scaledEx = Some(Seq(tinyS))) // covers <50% of records
    assert(underCovered.matchedExchanges.isEmpty && !underCovered.ok)
    // Near-gate detection: within 15% under the gate triggers the
    // descent's attribution printing.
    val near = Audit("q", m(100L << 20, 100000),
      Some(m((100L << 20) * f, (100000 * f * RowSlack * 0.9).toLong)), f)
    assert(near.rowNearGate && near.rowAggregateOk && near.ok)
  }
}
