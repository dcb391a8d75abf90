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

  test("enforcement math: record gate and the rows-linear byte widening") {
    import ShuffleAudit._
    def m(bytes: Long, rows: Long) = Metrics(bytes, 0, 0, 0, rows)
    val f = 10
    // Record breach is a failure even when bytes are linear (a
    // super-linear candidate stream of highly-compressible rows).
    val rowBreach = Audit("q", m(MinSignalBytes, MinSignalRecords),
      Some(m(MinSignalBytes * f, (MinSignalRecords * f * RowSlack).toLong + 1)), f)
    assert(rowBreach.rowEnforced && !rowBreach.rowOk && !rowBreach.ok)
    // Bytes past Slack but rows linear -> widened to WideByteSlack: the
    // r18 marginal-crossing class (13.51x/14.38x vs the 13.5 gate) is a
    // compression artifact, attributed on the line, and PASSES.
    val widened = Audit("q", m(MinSignalBytes, MinSignalRecords),
      Some(m((MinSignalBytes * f * 1.4).toLong, MinSignalRecords * f)), f)
    assert(widened.rowEnforced && widened.rowOk && widened.byteWidened && widened.ok)
    // Bytes past even WideByteSlack fail regardless of linear rows.
    val farBreach = Audit("q", m(MinSignalBytes, MinSignalRecords),
      Some(m((MinSignalBytes * f * (WideByteSlack + 0.1)).toLong, MinSignalRecords * f)), f)
    assert(farBreach.rowEnforced && farBreach.rowOk && !farBreach.ratioOk && !farBreach.ok)
    // Rows below their signal floor: bytes keep the TIGHT slack (no
    // widening without the compression-immune evidence).
    val noRows = Audit("q", m(MinSignalBytes, MinSignalRecords - 1),
      Some(m((MinSignalBytes * f * 1.4).toLong, (MinSignalRecords - 1) * f)), f)
    assert(!noRows.rowEnforced && !noRows.byteWidened && !noRows.ok)
  }
}
