package graft.tools

import graft.SparkSuite

/** Wires the linear-regime probe into `sbt test` at a small factor: the
  * probe machinery (MakeSf build, interleaved timing, ratio/floor
  * bookkeeping) runs end-to-end on sf0.001, where every base time sits
  * below the signal floor — so the spec asserts the MECHANICS (results
  * produced, floor correctly un-enforces sub-second ratios, enforcement
  * math) and leaves ratio enforcement to the CLI runs at sf0.1×10, same
  * division of labor as ScaleProbeSpec's wall-time ceiling.
  */
class LinearProbeSpec extends SparkSuite {

  test("probe runs end-to-end at factor 2 and applies the signal floor") {
    val scaledDir = tmp("graft-linear") + "/scaled"
    MakeSf.build(spark, sf(), scaledDir, 2)
    val results = LinearProbe.run(spark, sf(), scaledDir, 2,
      Seq("q01_pricing_summary", "dedup_jaccard_exact", "text_tfidf_top"))
    assert(results.size == 3)
    assert(results.forall(r => r.baseSec > 0 && r.scaledSec > 0))
    // sf0.001 queries are sub-second: the floor must mark them
    // unenforced-OK regardless of ratio jitter.
    results.filter(_.baseSec < LinearProbe.MinSignalSec).foreach { r =>
      assert(!r.enforced && r.ok, s"${r.query} enforced below the floor")
    }
  }

  test("enforcement math: breach only above floor and factor x slack") {
    val ok = LinearProbe.Result("q", baseSec = 2.0, scaledSec = 2.0 * 10 * LinearProbe.Slack - 0.1, factor = 10)
    assert(ok.enforced && ok.ok)
    val breach = LinearProbe.Result("q", baseSec = 2.0, scaledSec = 2.0 * 10 * LinearProbe.Slack + 0.1, factor = 10)
    assert(breach.enforced && !breach.ok)
    val floored = LinearProbe.Result("q", baseSec = 0.5, scaledSec = 60.0, factor = 10)
    assert(!floored.enforced && floored.ok)
  }
}
