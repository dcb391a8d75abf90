package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Output-shape contract for the driver's DuckDB comparator (the round-12
  * red-row class): the harness sorts result columns with pandas and
  * hashes scalar values, so
  *
  *  1. no registered query may emit a top-level array/struct/map column
  *     (pandas `sort_values` dies on unhashable ndarray cells — the
  *     layout_sequences / sim_random_projection failure); nested data
  *     must be pinned as scalars (md5, hex, comma-joined strings);
  *  2. no oracle SQL may let an integer `sum(...)` reach the final
  *     output un-cast: DuckDB widens integer sums to HUGEINT (int128),
  *     which hash-mismatches Spark's BIGINT even when every value is
  *     identical (the stats_corpus_report failure). Every `sum(` must
  *     be wrapped in a `cast(...)`, suffixed `::TYPE`, or sum an
  *     argument already cast to double/decimal.
  *
  * Deliberately breaking a query (dropping the `array_join` from
  * layout_sequences, or the oracle's `cast(sum(...) as bigint)`) fails
  * the corresponding test here before the driver ever sees it.
  */
class OutputShapeSpec extends SparkSuite {

  test("every registered query emits only scalar top-level columns") {
    val offenders = GraftQueries.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // Construction may eagerly materialize (Caching contract) —
        // schema inspection itself is analysis-only.
        val schema = try fn(spark, sf()).schema
          finally spark.catalog.clearCache()
        schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType]
                 || f.dataType.isInstanceOf[MapType]
                 || f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"nested top-level output columns (driver comparator cannot hash " +
        s"them):\n  ${offenders.mkString("\n  ")}")
  }

  test("every oracle SQL casts integer sums away from HUGEINT") {
    val offenders = GraftQueries.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => uncastSums(sql).map(ctx => s"$name: ...$ctx...")
    }
    assert(offenders.isEmpty,
      s"un-cast sum() in oracle SQL (DuckDB widens to HUGEINT and the " +
        s"driver hash-mismatches Spark's BIGINT):\n  " +
        offenders.mkString("\n  "))
  }

  test("the sum checker catches the round-12 bug patterns") {
    // The literal stats_corpus_report shape: CTE sum aliased, alias
    // passed through the final select bare.
    val r12 = """WITH g AS (SELECT lang, sum(n_tok) AS n_tokens
                 FROM q GROUP BY lang)
                 SELECT lang, n_tokens FROM g ORDER BY lang"""
    assert(uncastSums(r12).nonEmpty, "missed the CTE-alias passthrough")
    val fixed = r12.replace("sum(n_tok)", "cast(sum(n_tok) as bigint)")
    assert(uncastSums(fixed).isEmpty, "flagged the cast fix")
    // Un-cast sum directly in the final select.
    val direct = "SELECT lang, sum(n_tok) AS n_tokens FROM q GROUP BY lang"
    assert(uncastSums(direct).nonEmpty, "missed the final-select sum")
    assert(uncastSums(direct.replace("sum(n_tok)", "sum(n_tok)::BIGINT"))
      .isEmpty, "flagged the :: fix")
  }

  /** Occurrences of `sum(` whose HUGEINT result REACHES THE FINAL output:
    * the sum is neither enclosed by a `cast(`, nor suffixed `::`, nor
    * summing an argument already cast to double/decimal — AND it either
    * sits in the final top-level select list directly, or its alias is
    * used bare (un-cast) there. CTE-internal sums that are cast on the
    * way out (the project's `cast(off as bigint)` idiom) are fine: only
    * what the comparator hashes matters. Returns a context snippet per
    * violation.
    */
  private def uncastSums(sql: String): Seq[String] = {
    val s = sql.toLowerCase
    val depths = parenDepths(s)
    val (selStart, selEnd) = finalSelectRegion(s, depths)
    val sumRe = "(?<![\\w_.])sum\\s*\\(".r
    sumRe.findAllMatchIn(s).flatMap { m =>
      val open = s.indexOf('(', m.start)
      val close = matchingParen(s, open)
      val arg = s.substring(open + 1, close)
      val enclosedByCast = enclosingCalls(s, m.start).contains("cast")
      val suffixCast = s.drop(close + 1).dropWhile(_.isWhitespace).startsWith("::")
      val argAlreadyWide =
        Seq("as double", "as decimal", "::double", "::decimal")
          .exists(arg.contains)
      // DuckDB `/` is true division: any sum used as an operand of `/`
      // yields DOUBLE, never HUGEINT.
      val divOperand =
        s.substring(0, m.start).reverse.dropWhile(_.isWhitespace).headOption
          .contains('/') ||
        s.drop(close + 1).dropWhile(_.isWhitespace).headOption.contains('/')
      val snippet = sql.substring(math.max(0, m.start - 20),
        math.min(sql.length, close + 10)).replaceAll("\\s+", " ")
      if (enclosedByCast || suffixCast || argAlreadyWide || divOperand) None
      else if (m.start >= selStart && m.start < selEnd) Some(snippet)
      else selectItemAlias(s, depths, m.start, close) match {
        case Some(alias)
            if bareUseIn(s, depths, alias, selStart, selEnd) =>
          Some(s"$snippet (alias '$alias' reaches final select un-cast)")
        case _ => None // cast downstream, aggregated away, or HAVING-only
      }
    }.toSeq
  }

  /** Paren depth at each character position. */
  private def parenDepths(s: String): Array[Int] = {
    val d = new Array[Int](s.length)
    var depth = 0
    var i = 0
    while (i < s.length) {
      if (s(i) == '(') depth += 1
      d(i) = depth // position of ')' still counts as inside
      if (s(i) == ')') depth -= 1
      i += 1
    }
    d
  }

  /** [start, end) of the final top-level select list: last `select` at
    * depth 0 through the matching depth-0 `from` (or end of string).
    */
  private def finalSelectRegion(s: String, depths: Array[Int]): (Int, Int) = {
    val sel = "(?<![\\w_])select(?![\\w_])".r.findAllMatchIn(s)
      .filter(m => depths(m.start) == 0).map(_.end).toSeq.lastOption.getOrElse(0)
    val end = "(?<![\\w_])from(?![\\w_])".r.findAllMatchIn(s)
      .find(m => m.start > sel && depths(m.start) == 0)
      .map(_.start).getOrElse(s.length)
    (sel, end)
  }

  /** Alias of the select-item containing the sum at [start, close]: scan
    * forward at the item's own depth (the depth of its enclosing
    * `select`) for a trailing `as <name>` before the item-ending comma /
    * `from` / closing paren. `as` tokens at deeper levels (e.g. inside
    * `cast(x as bigint)` or a sibling call) are skipped.
    */
  private def selectItemAlias(s: String, depths: Array[Int],
      sumStart: Int, close: Int): Option[String] = {
    val selPos = "(?<![\\w_])select(?![\\w_])".r.findAllMatchIn(s.substring(0, sumStart))
      .map(_.start).toSeq.lastOption.getOrElse(return None)
    val d = depths(selPos)
    var alias: Option[String] = None
    val tail = s.substring(close + 1)
    for (m <- "(?<![\\w_])(as\\s+([a-z0-9_]+)|from|,)".r.findAllMatchIn(tail)) {
      val pos = close + 1 + m.start
      if (depths(pos) == d || (s(pos) == ',' && depths(pos) == d)) {
        m.group(1) match {
          case a if a.startsWith("as") => return Some(m.group(2))
          case _ => return alias // item ended without alias at this depth
        }
      }
    }
    alias
  }

  /** True if `name` occurs in [from, to) outside any `cast(...)` and not
    * suffixed `::` — i.e. the HUGEINT flows through to the output.
    */
  private def bareUseIn(s: String, depths: Array[Int], name: String,
      from: Int, to: Int): Boolean = {
    val re = ("(?<![\\w_])" + java.util.regex.Pattern.quote(name) + "(?![\\w_])").r
    re.findAllMatchIn(s.substring(from, to)).exists { m =>
      val pos = from + m.start
      val end = from + m.end
      val cast = enclosingCalls(s, pos).contains("cast")
      val suffix = s.drop(end).dropWhile(_.isWhitespace).startsWith("::")
      // `AS name` re-defining the output alias is a definition, not a use
      // (`cast(n_kept as bigint) AS n_kept` is the idiom). Scan back over
      // any table qualifier (`sp.n_tokens`) first.
      val tokenStart = {
        var i = pos
        while (i > 0 && (s(i - 1) == '.' || s(i - 1).isLetterOrDigit
            || s(i - 1) == '_')) i -= 1
        i
      }
      val beforeRev = s.substring(0, tokenStart).reverse.dropWhile(_.isWhitespace)
      val aliasDef = beforeRev.startsWith("sa") && // reversed "as" token
        beforeRev.drop(2).headOption.forall(_.isWhitespace)
      // Division operand → DOUBLE in DuckDB, never HUGEINT.
      val divOperand = beforeRev.headOption.contains('/') ||
        s.drop(end).dropWhile(_.isWhitespace).headOption.contains('/')
      !cast && !suffix && !aliasDef && !divOperand
    }
  }

  /** Index of the paren matching the one at `open`. */
  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    s.length - 1
  }

  /** Names of the function calls whose open paren is still unclosed at
    * position `pos` (innermost last) — "is this sum inside a cast(...)".
    */
  private def enclosingCalls(s: String, pos: Int): Seq[String] = {
    val stack = scala.collection.mutable.Stack[String]()
    var i = 0
    while (i < pos) {
      s(i) match {
        case '(' =>
          val before = s.substring(0, i).reverse.takeWhile(c =>
            c.isLetterOrDigit || c == '_').reverse
          stack.push(before)
        case ')' => if (stack.nonEmpty) stack.pop()
        case _ =>
      }
      i += 1
    }
    stack.toSeq
  }
}
