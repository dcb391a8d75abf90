package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source lint for the two scale contracts prose can't enforce:
  *
  *  1. NO Scala UDFs in main source — every per-row kernel is either a
  *     built-in function or a native Catalyst expression (the codegen
  *     rule the whole functions/ package exists for). `udf(` appearing
  *     anywhere in main is a regression.
  *  2. Driver materializations (`collect`/`head`/`first`/
  *     `toLocalIterator`) are pinned to an EXACT allowlist of documented
  *     model-sized sites. Each is bounded by config, not corpus:
  *     IVF centroid fitting (nlist×dims rows), the pack's per-partition
  *     totals (P rows), and the collapse wrappers' max-class-size switch
  *     (1 row). Moving, adding, or duplicating a site fails this spec —
  *     the diff must then update the allowlist, making every new driver
  *     materialization a REVIEWED decision instead of a silent scale
  *     leak.
  *
  * Matching is done on comment-stripped source so scaladoc may discuss
  * `collect()` freely; string literals in main source don't mention these
  * tokens today (and a false positive is a loud, fixable failure, never a
  * silent pass).
  */
class CollectLintSpec extends AnyFunSuite {

  private val mainRoot = Paths.get("src/main/scala")

  /** (relative path → expected occurrence count) of driver
    * materializations; everything not listed must have zero.
    */
  private val allowedCollects: Map[String, Int] = Map(
    "graft/ops/SimilarityOps.scala" -> 3, // meansOf: nlist×dims centroid model
                                          // fit; pqMeans: dims×ksub PQ codebook
                                          // fit — both config-sized per pass;
                                          // pqProbeServe strict guard: 1-row
                                          // min(vec_id) on the FAILURE path
                                          // only, over the bounded shortlist
    "graft/ops/LayoutOps.scala" -> 1, // packByTokenBudgetKeys: P-row partition totals
    "graft/ops/TextOps.scala" -> 2,  // trainBpeMerges: 1-row argmax per
                                     // merge step — the model fit, like
                                     // the IVF centroid loop;
                                     // dedupSubstringsAcrossDocs: 1-row
                                     // pricing read (gram volume + packed
                                     // keep-first bounds) over the cached
                                     // per-doc frame — the volume-sized
                                     // partitioning guard (r21)
    "graft/ops/DedupOps.scala" -> 3, // maxLongOf: the one 1-row max read
                                     // behind every plan switch (dup-class
                                     // size, hot-bucket counts) — bounded
                                     // by agg at every call site; totalOf
                                     // (r18): the 1-row sum aggregate
                                     // pricing posting/pair volume for the
                                     // volume-sized partitioning guards;
                                     // sumAndMax (r21): the job-fold of
                                     // the two — one 1-row read where a
                                     // site needs both a Σ price and a max
    "graft/ops/ClassifierOps.scala" -> 1, // trainPerceptron: the
                                     // (numBuckets+1)-row per-step
                                     // gradient — the model fit
    "graft/ops/ModelIO.scala" -> 7,  // the four model LOADERS (each
                                     // reads a config-sized persisted
                                     // model table, never data) + the
                                     // ref-index meta: saveRefIndex's
                                     // 1-row max-class aggregate over
                                     // the written reps table and
                                     // loadRefIndex's 1-row meta read
                                     // + loadPqIndex's 1-row meta read
    "graft/ops/CurationPipeline.scala" -> 1, // Run.load: the stage-count-
                                     // sized meta table (stage_idx →
                                     // name rows), never a stage frame
    "graft/tools/LshTune.scala" -> 2, // offline tuning CLI, not an
                                     // operator: both reads are top-k
                                     // result sets (queries×k rows),
                                     // bounded by the grid's fixed
                                     // 10-query probe
    "graft/tools/ScaleProbe.scala" -> 2, // longScalar (the sizing probe's
                                     // 1-row pair-budget aggregate) and
                                     // checkTemperature's group-
                                     // cardinality counts (≤ #languages
                                     // rows) — probe oracles, not
                                     // operators
    "graft/Bench.scala" -> 1)        // calib_ms: the calibration query's
                                     // 1-row sum aggregate (r20 — the
                                     // machine-speed divisor on the
                                     // bench line)

  private val collectPattern =
    """\.(collect\(\)|collectAsList|head\(\)|first\(\)|toLocalIterator)""".r
  private val udfPattern = """(^|[^\w.])udf\s*\(""".r

  private def stripComments(src: String): String = {
    // Order matters: string literals FIRST (the oracle SQL blocks contain
    // `//` — DuckDB integer division — which a naive line-comment strip
    // would treat as a comment, hiding anything after them on the same
    // physical line), then block comments, then line comments. Triple-
    // quoted before single-quoted so the quotes inside """…""" don't
    // start a phantom string.
    val noTriple = "(?s)\"\"\".*?\"\"\"".r.replaceAllIn(src, "\"S\"")
    val noString = "\"(?:[^\"\\\\\\n]|\\\\.)*\"".r.replaceAllIn(noTriple, "\"S\"")
    val noBlock = """(?s)/\*.*?\*/""".r.replaceAllIn(noString, "")
    noBlock.linesIterator.map { l =>
      val i = l.indexOf("//")
      if (i >= 0) l.substring(0, i) else l
    }.mkString("\n")
  }

  private def mainSources: Seq[(String, String)] = {
    val files = Files.walk(mainRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq.sortBy(_.toString)
    assert(files.nonEmpty, s"no sources under $mainRoot — lint running from wrong cwd?")
    files.map { p: Path =>
      (mainRoot.relativize(p).toString,
        stripComments(new String(Files.readAllBytes(p), "UTF-8")))
    }
  }

  test("driver materializations stay on the documented bounded sites") {
    val counts = mainSources.map { case (rel, src) =>
      rel -> collectPattern.findAllIn(src).size
    }.filter(_._2 > 0).toMap
    assert(counts == allowedCollects,
      s"driver-materialization sites changed.\n  found: $counts\n  " +
        s"allowed: $allowedCollects\nA new collect/head/first in an operator " +
        "is a scale decision — justify it in the allowlist or remove it.")
  }

  test("no Scala UDFs anywhere in main source") {
    val offenders = mainSources.collect {
      case (rel, src) if udfPattern.findFirstIn(src).isDefined => rel
    }
    assert(offenders.isEmpty,
      s"udf( found in $offenders — use a built-in function or a native expression")
  }
}
