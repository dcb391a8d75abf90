package graft.tools

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Dev tool: calibration-normalized comparison of two bench lines —
  * the adjudication step VERDICT r20 #6 / r21 #2 asked for. Round 21
  * burned a full judge pass hand-dividing 12 apparent regressions by a
  * 2.2× calibration skew; the divisor is already ON the line
  * (`calib_ms`), so this tool does the division once and prints a
  * per-query verdict nobody has to re-derive.
  *
  * Inputs: two files, each either
  *   - a raw bench stdout capture (the last line containing
  *     `{"metric":"total"` is taken), or
  *   - a driver `BENCH_rNN.json` (the line is extracted from its
  *     `tail` member).
  *
  * Normalization: each side's per-query seconds divide by its own
  * `calib_ms.end` (fallback `start`, then `cold`) — the fixed-work
  * single-thread calibration Bench runs on the same session. The
  * normalized speedup of query q is
  *     (secA / calibA) / (secB / calibB),
  * i.e. >1 means B is faster after machine-speed correction. Queries
  * only on one side are listed separately (fold-bucket membership
  * shifts move fast queries in and out of "other"; that is a display
  * artifact, not a drop — Bench keeps totals over the full registry).
  *
  * Verdict bands (`--band=0.15` default): a query prints `improved` /
  * `REGRESSED` only when BOTH the raw and the normalized speedup sit
  * outside the band on the SAME side — calibration skew moves only the
  * normalized figure (a loaded box slows the single-thread calib more
  * than the 32-way queries), while a real plan change moves both; when
  * the two disagree, the honest verdict is `flat` with both numbers on
  * the line for the reader. The summary carries the normalized geomean
  * over common named queries and both total ratios.
  *
  * Usage: runMain graft.tools.BenchCompare <fileA(prev)> <fileB(now)> [--band=0.15]
  * Pure file IO — no SparkSession; safe to run anywhere.
  */
object BenchCompare {
  private val mapper = new ObjectMapper()

  /** Extract the bench JSON line from raw stdout or a driver BENCH json. */
  private[tools] def extractLine(content: String): String = {
    val trimmed = content.trim
    val source =
      if (trimmed.startsWith("{") && trimmed.contains("\"tail\"")) {
        // driver BENCH_rNN.json: the bench line lives inside "tail"
        val node = mapper.readTree(trimmed)
        Option(node.get("tail")).map(_.asText()).getOrElse(trimmed)
      } else content
    val marker = "{\"metric\":\"total\""
    val at = source.lastIndexOf(marker)
    require(at >= 0, "no bench line ({\"metric\":\"total\"...) found in input")
    val rest = source.substring(at)
    val end = rest.indexOf('\n')
    (if (end >= 0) rest.substring(0, end) else rest).trim
  }

  private[tools] case class Side(queries: Map[String, Double], total: Double,
      coldTotal: Option[Double], calibMs: Double, calibLabel: String)

  private[tools] def parseSide(line: String): Side = {
    val node = mapper.readTree(line)
    val qs = Option(node.get("queries")).map { q =>
      q.properties().asScala.map(e => e.getKey -> e.getValue.asDouble()).toMap
    }.getOrElse(Map.empty[String, Double])
    val calib = Option(node.get("calib_ms"))
    def c(k: String): Option[Double] =
      calib.flatMap(n => Option(n.get(k))).map(_.asDouble()).filter(_ > 0)
    val (ms, label) = c("end").map((_, "end"))
      .orElse(c("start").map((_, "start")))
      .orElse(c("cold").map((_, "cold")))
      .getOrElse((1000.0, "none(1s)"))
    Side(qs, Option(node.get("value")).map(_.asDouble()).getOrElse(0.0),
      Option(node.get("cold_total")).map(_.asDouble()), ms, label)
  }

  def main(args: Array[String]): Unit = {
    val files = args.filterNot(_.startsWith("--"))
    require(files.length == 2, "usage: BenchCompare <fileA(prev)> <fileB(now)> [--band=0.15]")
    val band = args.collectFirst { case a if a.startsWith("--band=") =>
      a.stripPrefix("--band=").toDouble }.getOrElse(0.15)
    val Array(a, b) = files.map(f =>
      parseSide(extractLine(new String(Files.readAllBytes(Paths.get(f)), "UTF-8"))))
    println(f"[cmp] calib A=${a.calibMs}%.0f ms (${a.calibLabel}), B=${b.calibMs}%.0f ms (${b.calibLabel}); machine ratio A/B=${a.calibMs / b.calibMs}%.2f")
    val common = (a.queries.keySet & b.queries.keySet) - "other"
    val rows = common.toSeq.map { q =>
      val (ta, tb) = (a.queries(q), b.queries(q))
      val raw = ta / tb
      val norm = (ta / a.calibMs) / (tb / b.calibMs)
      (q, ta, tb, raw, norm)
    }.sortBy(-_._5)
    val lo = 1.0 - band
    val hi = 1.0 / lo
    def verdictOf(raw: Double, norm: Double): String =
      if (raw > hi && norm > hi) "improved"
      else if (raw < lo && norm < lo) "REGRESSED"
      else "flat"
    rows.foreach { case (q, ta, tb, raw, norm) =>
      println(f"[cmp] $q%-38s A=$ta%6.2f s  B=$tb%6.2f s  raw=$raw%5.2fx  norm=$norm%5.2fx  ${verdictOf(raw, norm)}")
    }
    (a.queries.keySet -- b.queries.keySet).toSeq.sorted.foreach(q =>
      println(s"[cmp] only-in-A (fold-bucket shift unless dropped from registry): $q"))
    (b.queries.keySet -- a.queries.keySet).toSeq.sorted.foreach(q =>
      println(s"[cmp] only-in-B (fold-bucket shift unless newly named): $q"))
    val geo =
      if (rows.isEmpty) 1.0
      else math.exp(rows.map(r => math.log(r._5)).sum / rows.size)
    val totalNorm = (a.total / a.calibMs) / (b.total / b.calibMs)
    val nReg = rows.count(r => verdictOf(r._4, r._5) == "REGRESSED")
    val nImp = rows.count(r => verdictOf(r._4, r._5) == "improved")
    println(f"[cmp] SUMMARY common=${rows.size} improved=$nImp regressed=$nReg geomean_norm=$geo%5.3fx total A=${a.total}%.2f B=${b.total}%.2f raw=${a.total / b.total}%5.2fx norm=$totalNorm%5.2fx band=+-${band * 100}%.0f%%")
  }
}
