package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench gate reads ONE JSON line from a ~2000-char stdout tail; an
  * overlong or malformed line silently zeroes the round's bench numbers
  * (it did once: a full-precision 2.6 KB line overflowed the tail and the
  * harness recorded `parsed: null`). These specs pin the line contract:
  * valid JSON, hard length budget, fold-preserves-total, errors surfaced.
  */
class BenchLineSpec extends AnyFunSuite {

  private def queries(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"query_with_a_long_descriptive_name_$i%03d", i * 0.37))

  test("line fits the tail budget even with hundreds of queries") {
    for (n <- Seq(1, 73, 200, 500)) {
      val line = Bench.renderLine(queries(n), Nil, "/root/testdata/sf0.1", n)
      assert(line.length <= Bench.LineBudget, s"n=$n length=${line.length}")
      assert(!line.contains("\n"))
    }
  }

  test("folding keeps the slowest queries visible and preserves the total") {
    val qs = queries(300)
    val line = Bench.renderLine(qs, Nil, "sf", 300)
    // Slowest query always survives folding; the folded bucket is named.
    assert(line.contains("query_with_a_long_descriptive_name_300"))
    assert(line.contains("\"other\":"))
    // value == sum of all queries (folding must not drop time).
    val value = "\"value\":([0-9.]+)".r.findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(value - qs.map(_._2).sum) < 0.01, line)
    // Visible entries + the folded bucket ≈ value (nothing dropped).
    val qstart = line.indexOf("\"queries\":{") + "\"queries\":".length
    val qobj = line.substring(qstart, line.indexOf("}", qstart) + 1)
    val shown = ":([0-9.]+)[,}]".r.findAllMatchIn(qobj).map(_.group(1).toDouble).toSeq
    assert(math.abs(shown.sum - value) < 1.0, line) // 2-decimal rounding slack
  }

  test("line is valid JSON with the contract fields") {
    val line = Bench.renderLine(queries(73), Seq("q_bad:SparkException"), "sf0.1", 74)
    // No JSON parser on the unmanaged classpath worth pulling in — assert
    // the structural invariants the driver's json.loads depends on.
    assert(line.startsWith("{\"metric\":\"total\","))
    assert(line.endsWith("\"sf\":\"sf0.1\"}"))
    assert(line.contains("\"unit\":\"sec\""))
    assert(line.contains("\"n_queries\":74"))
    assert(line.contains("\"errors\":[\"q_bad:SparkException\"]"))
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.count(_ == '[') == line.count(_ == ']'))
    assert(line.count(_ == '"') % 2 == 0)
  }

  test("quotes, backslashes and control chars in strings are JSON-escaped") {
    val line = Bench.renderLine(
      Seq(("""q"uo\te""", 1.0)),
      Seq("bad:Exception\"msg\\with\nnewline"),
      """/dir/with"quote""", 2)
    // Raw specials must never reach the line unescaped.
    assert(line.contains("q\\\"uo\\\\te"), line)
    assert(line.contains("\\\"msg\\\\with\\u000anewline"), line)
    assert(line.contains("/dir/with\\\""), line)
    assert(!line.contains("\n"))
    // Unescaped-quote parity still holds (every " is a delimiter or \").
    assert(line.replace("\\\\", "").replace("\\\"", "").count(_ == '"') % 2 == 0)
  }

  test("empty results still render a parseable line") {
    val line = Bench.renderLine(Nil, Nil, "sf", 0)
    assert(line.contains("\"value\":0.00") && line.contains("\"queries\":{}"), line)
  }

  test("outlier flagging: above 2s AND 3x median; failures never flagged") {
    val samples = Seq[(String, Either[String, Double])](
      ("q_fast", Right(0.4)), ("q_mid", Right(0.6)), ("q_slow", Right(6.0)),
      ("q_big_but_typical", Right(1.9)), // > 3x median but under the 2s floor
      ("q_fail", Left("q_fail:SparkException")))
    assert(Bench.flagOutliers(samples) == Seq("q_slow"))
    // A run whose median is itself large flags nothing at 3x.
    val loaded = Seq[(String, Either[String, Double])](
      ("a", Right(4.0)), ("b", Right(5.0)), ("c", Right(6.0)))
    assert(Bench.flagOutliers(loaded).isEmpty)
    assert(Bench.flagOutliers(Nil).isEmpty)
  }

  test("deferred re-times merge as best-of-all-samples; failures and unflagged untouched") {
    val first = Seq[(String, Either[String, Double])](
      ("q_spiked", Right(6.0)), ("q_ok", Right(0.5)),
      ("q_fail", Left("q_fail:SparkException")))
    val merged = Bench.mergeBest(first,
      Map("q_spiked" -> 0.7, "q_fail" -> 9.9, "q_absent" -> 1.0))
    assert(merged.toMap == Map(
      "q_spiked" -> Right(0.7), "q_ok" -> Right(0.5),
      "q_fail" -> Left("q_fail:SparkException")))
    // A retry slower than the first sample never worsens the figure.
    assert(Bench.mergeBest(Seq(("q", Right(1.0))), Map("q" -> 3.0)) ==
      Seq(("q", Right(1.0))))
  }

  test("warm merge: best warm sample wins; warm-failure falls back to cold; spread is median") {
    val cold = Seq[(String, Either[String, Double])](
      ("q_a", Right(5.0)), ("q_b", Right(2.0)),
      ("q_warm_failed", Right(3.0)),
      ("q_fail", Left("q_fail:SparkException")))
    val sweeps = Seq(
      Map("q_a" -> 1.0, "q_b" -> 1.0),
      Map("q_a" -> 1.5, "q_b" -> 1.1))
    val (merged, spread) = Bench.warmMerge(cold, sweeps)
    assert(merged.toMap == Map(
      "q_a" -> Right(1.0), "q_b" -> Right(1.0),
      "q_warm_failed" -> Right(3.0), // all warm attempts failed → cold time kept
      "q_fail" -> Left("q_fail:SparkException")))
    // Per-query spreads: q_a (1.5-1.0)/1.0=0.5, q_b (1.1-1.0)/1.0=0.1 → median
    // of [0.1, 0.5] picks index size/2 = 0.5.
    assert(math.abs(spread - 0.5) < 1e-9)
    // No warm sweeps at all: cold passes through, spread undefined → 0.
    assert(Bench.warmMerge(cold, Nil) == ((cold, 0.0)))
  }

  test("spread escalation: noisy sweeps trigger extra runs that displace the poisoned sweep") {
    val cold = Seq[(String, Either[String, Double])](
      ("q_a", Right(5.0)), ("q_b", Right(5.0)), ("q_c", Right(5.0)))
    val clean = Map("q_a" -> 1.0, "q_b" -> 1.0, "q_c" -> 1.0)
    val poisoned = Map("q_a" -> 2.0, "q_b" -> 2.0, "q_c" -> 2.0) // run-long load spike
    // Base sweeps: one clean + one poisoned → per-query spread 1.0 > bar.
    var ran = 0
    val (merged, spread, extra) = Bench.escalateWarm(cold, Seq(clean, poisoned),
      () => { ran += 1; Map("q_a" -> 1.05, "q_b" -> 1.05, "q_c" -> 1.05) },
      bar = 0.20, maxExtra = 2)
    // ONE extra clean-ish sweep displaces the poisoned one from each
    // query's best-2 window: spread (1.05-1.0)/1.0 = 0.05 <= bar.
    assert(ran == 1 && extra == 1)
    assert(spread <= 0.20, s"spread=$spread")
    // The reported figure stays the global minimum.
    assert(merged.toMap == Map("q_a" -> Right(1.0), "q_b" -> Right(1.0), "q_c" -> Right(1.0)))
  }

  test("spread escalation: persistent noise stops at the cap with extra count surfaced") {
    val cold = Seq[(String, Either[String, Double])](("q", Right(5.0)))
    var ran = 0
    val noisy = Iterator(Map("q" -> 1.0), Map("q" -> 3.0), Map("q" -> 2.0), Map("q" -> 4.0))
    val (_, spread, extra) = Bench.escalateWarm(cold,
      Seq(noisy.next(), noisy.next()), () => { ran += 1; noisy.next() },
      bar = 0.20, maxExtra = 2)
    assert(ran == 2 && extra == 2) // capped — never unbounded
    assert(spread > 0.20) // still high → main() marks spread_escalated on the line
  }

  test("spread escalation: quiet sweeps never escalate and reduce to warmMerge") {
    val cold = Seq[(String, Either[String, Double])](("q", Right(5.0)))
    val sweeps = Seq(Map("q" -> 1.0), Map("q" -> 1.1))
    val (merged, spread, extra) = Bench.escalateWarm(cold, sweeps,
      () => fail("must not run a sweep when spread is under the bar"),
      bar = 0.20, maxExtra = 2)
    assert(extra == 0)
    assert((merged, spread) == Bench.warmMerge(cold, sweeps))
  }

  test("cold map keeps the 10 slowest by name and folds the rest, preserving the total") {
    val cold = (1 to 40).map(i => (f"cold_query_$i%02d", i * 0.5))
    val m = Bench.renderColdMap(cold)
    // Slowest 10 visible by name; the rest folded.
    assert(m.contains("cold_query_40") && m.contains("cold_query_31"), m)
    assert(!m.contains("cold_query_30"), m)
    assert(m.contains("\"other\":"), m)
    // Fold preserves the sum — "cold" entries + other == cold_total.
    val shown = ":([0-9.]+)[,}]".r.findAllMatchIn(m).map(_.group(1).toDouble).toSeq
    assert(math.abs(shown.sum - cold.map(_._2).sum) < 0.5, m) // 2-decimal slack
    // Small runs need no fold and emit every name.
    val small = Bench.renderColdMap(Seq(("a", 1.0), ("b", 2.0)))
    assert(small == "{\"a\":1.00,\"b\":2.00}", small)
  }

  test("the warm-mode extra with a full cold map still fits the tail budget") {
    // The REAL registry size (not a pinned constant that silently goes
    // stale as queries land) with realistic name lengths, cold figures
    // attached — the exact shape main() emits per round.
    val n = SparkEntry.queries.size
    val qs = queries(n)
    val coldPart = Bench.renderColdMap(qs.map { case (q, t) => (q, t * 2.5) })
    val extra = "\"mode\":\"warm2\",\"cold_total\":181.18,\"cold\":" + coldPart +
      ",\"spread_med\":0.14"
    val line = Bench.renderLine(qs, Nil, "/root/testdata/sf0.1", n, extra)
    assert(line.length <= Bench.LineBudget, s"length=${line.length}")
    assert(line.contains("\"cold\":{"), line)
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.count(_ == '"') % 2 == 0)
    // The warm fold absorbed the cold member: value is still the full sum.
    val value = "\"value\":([0-9.]+)".r.findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(value - qs.map(_._2).sum) < 0.01, line)
  }

  test("extra JSON members render before sf and the line stays valid") {
    val line = Bench.renderLine(queries(73), Nil, "sf0.1", 73,
      "\"mode\":\"warm2\",\"cold_total\":41.20,\"spread_med\":0.08")
    assert(line.contains("\"mode\":\"warm2\",\"cold_total\":41.20,\"spread_med\":0.08,\"sf\":\"sf0.1\"}"), line)
    assert(line.length <= Bench.LineBudget)
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.count(_ == '"') % 2 == 0)
  }

  test("mass-failure rounds truncate errors to fit the budget, keeping a count") {
    val errs = (1 to 80).map(i => f"failing_query_number_$i%03d:SparkException")
    val line = Bench.renderLine(queries(5), errs, "sf", 85)
    assert(line.length <= Bench.LineBudget, s"length=${line.length}")
    assert(line.contains("failing_query_number_001"), line) // prefix survives
    assert(" more\"".r.findFirstIn(line).isDefined, line)   // truncation marker
    assert(line.count(_ == '[') == line.count(_ == ']'))
    assert(line.count(_ == '"') % 2 == 0)
  }
}
