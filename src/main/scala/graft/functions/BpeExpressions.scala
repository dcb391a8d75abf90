package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-level BPE tokenizer with a bundled merge table —
  * the subword token counter real budget packing uses (whitespace counts
  * over-weight morphologically rich text and under-weight long compound
  * tokens). Public algorithm (Sennrich et al. 2016 / the GPT-2 byte-level
  * variant); the bundled table is hand-ordered from common English bigram
  * frequency — a demonstration vocabulary, swappable for a trained one.
  *
  * Inference semantics: merges apply IN RANK ORDER, each as ONE
  * left-to-right non-overlapping pass over the current token sequence.
  * For a VALID merge table — every merge side is a base byte or the
  * result of an EARLIER merge, enforced at class load — this equals the
  * canonical iterative lowest-rank-pair inference loop: a rank-r pair's
  * constituents cannot be produced by a later merge, so once rank r's
  * pass completes, no rank-r pair can reappear. The property spec checks
  * the equivalence against an independent iterative reference.
  *
  * Tokens are contiguous byte slices of the document, so a segmentation
  * is just a boundary array — each merge pass is a linear scan with two
  * slice compares per position, no per-token allocation.
  *
  * The same table and semantics are exportable as DuckDB SQL
  * ([[Bpe.duckdbTokenCountExpr]]) for value-exact oracle checks: the
  * token stream is rendered as `||`-separated uppercase hex (DuckDB's
  * `hex()` casing), and one `replace(s, '|A||B|', '|AB|')` per merge IS
  * that merge's left-to-right pass — the pattern consumes one of the two
  * boundary pipes on each side, so the replacement's own pipes
  * reconstitute the separators and chained/adjacent occurrences merge
  * exactly as the scan does.
  */
object Bpe {

  /** Merge table, rank order, uppercase hex over UTF-8 bytes. Validity
    * (each side base-or-earlier-result) is enforced below.
    */
  val merges: Seq[(String, String)] = Seq(
    "74" -> "68", // th
    "7468" -> "65", // the
    "69" -> "6E", // in
    "65" -> "72", // er
    "61" -> "6E", // an
    "6F" -> "6E", // on
    "72" -> "65", // re
    "61" -> "74", // at
    "65" -> "6E", // en
    "6F" -> "72", // or
    "65" -> "73", // es
    "73" -> "74", // st
    "61" -> "72", // ar
    "6F" -> "75", // ou
    "69" -> "73", // is
    "69" -> "74", // it
    "6E" -> "67", // ng
    "696E" -> "67", // ing = in + g
    "616E" -> "64", // and = an + d
    "65" -> "64", // ed
    "6C" -> "65", // le
    "61" -> "6C", // al
    "6F" -> "66", // of
    "74" -> "6F", // to
    "6D" -> "65", // me
    "68" -> "61", // ha
    "68" -> "65", // he
    "6C" -> "6C", // ll
    "75" -> "72", // ur
    "63" -> "68", // ch
    "6C" -> "79", // ly
    "7468" -> "6174", // that = th + at
    "20" -> "74", // " t"
    "2074" -> "68", // " th"
    "207468" -> "65", // " the"
    "20" -> "61", // " a"
    "20" -> "73", // " s"
    "20" -> "6F", // " o"
    "20" -> "77", // " w"
    "20" -> "63", // " c"
    "20" -> "62", // " b"
    "20" -> "66", // " f"
    "20" -> "70", // " p"
    "20" -> "6D", // " m"
    "20" -> "64", // " d"
    "30" -> "30", // 00
    "31" -> "39", // 19
    "32" -> "30", // 20
    "2E" -> "20", // ". "
    "2C" -> "20") // ", "

  private def hexToBytes(h: String): Array[Byte] = {
    require(h.length % 2 == 0 && h.forall(c => c.isDigit || (c >= 'A' && c <= 'F')),
      s"merge side '$h' is not uppercase hex")
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  // Validity: each side is one base byte or an EARLIER merge's result,
  // and results are unique — the precondition for pass-per-rank inference
  // being exact (scaladoc above). A bad table is a loud class-load error.
  locally {
    val formed = scala.collection.mutable.Set[String]()
    merges.foreach { case (a, b) =>
      require(a.length == 2 || formed(a),
        s"invalid merge table: left side '$a' is neither a base byte nor an earlier result")
      require(b.length == 2 || formed(b),
        s"invalid merge table: right side '$b' is neither a base byte nor an earlier result")
      val m = a + b
      require(!formed(m), s"invalid merge table: duplicate result '$m'")
      formed += m
    }
  }

  private val mergeBytes: Array[(Array[Byte], Array[Byte])] =
    merges.map { case (a, b) => (hexToBytes(a), hexToBytes(b)) }.toArray

  private def sliceEq(bytes: Array[Byte], from: Int, until: Int,
      pat: Array[Byte]): Boolean = {
    if (until - from != pat.length) return false
    var i = 0
    while (i < pat.length) {
      if (bytes(from + i) != pat(i)) return false
      i += 1
    }
    true
  }

  /** Token boundary offsets (starts plus end sentinel); length 1 for an
    * empty input. Package-visible for the property spec.
    */
  private[functions] def segment(bytes: Array[Byte]): Array[Int] = {
    var bounds = Array.tabulate(bytes.length + 1)(identity)
    var r = 0
    while (r < mergeBytes.length && bounds.length > 2) {
      val (a, b) = mergeBytes(r)
      val next = new Array[Int](bounds.length)
      var out = 0
      var i = 0
      while (i < bounds.length - 1) {
        next(out) = bounds(i); out += 1
        if (i < bounds.length - 2 &&
            sliceEq(bytes, bounds(i), bounds(i + 1), a) &&
            sliceEq(bytes, bounds(i + 1), bounds(i + 2), b)) i += 2
        else i += 1
      }
      next(out) = bytes.length; out += 1
      bounds = java.util.Arrays.copyOf(next, out)
      r += 1
    }
    bounds
  }

  /** BPE token count of a byte string (0 for empty). */
  def tokenCount(bytes: Array[Byte]): Int = segment(bytes).length - 1

  /** Tokens as uppercase hex strings — the spec/reference surface. */
  def tokensHex(bytes: Array[Byte]): Seq[String] = {
    val bounds = segment(bytes)
    (0 until bounds.length - 1).map { i =>
      (bounds(i) until bounds(i + 1))
        .map(j => f"${bytes(j) & 0xff}%02X").mkString
    }
  }

  /** DuckDB SQL rendering varchar expression `c`'s BPE token stream as
    * the `||`-separated uppercase-hex string — one replace per merge
    * (see class scaladoc for why replace == the merge pass). The `||`
    * separator/edge invariant survives every replace, so
    * `string_split(…, '||')` recovers `['', tok1, …, tokN, '']`.
    */
  def duckdbRenderedExpr(c: String): String = {
    val encoded = s"'||' || array_to_string(list_transform(" +
      s"range(1, len(hex($c))//2 + 1), i -> substr(hex($c), 2*i-1, 2)), '||') || '||'"
    merges.foldLeft(encoded) { case (s, (a, b)) =>
      s"replace($s, '|$a||$b|', '|$a$b|')"
    }
  }

  /** DuckDB SQL computing the identical token count for varchar
    * expression `c` (0 for empty — the empty rendering '||||' would
    * otherwise read as one phantom empty token).
    */
  def duckdbTokenCountExpr(c: String): String = {
    val replaced = duckdbRenderedExpr(c)
    s"CASE WHEN len($c) = 0 THEN 0 ELSE " +
      s"(len($replaced) - len(replace($replaced, '|', ''))) // 2 - 1 END"
  }
}

/** bpe_token_count(text) → int: byte-level BPE token count under the
  * bundled [[Bpe]] merge table. Null in → null out; empty → 0. Same
  * CodegenFallback posture as the sibling text kernels ([[WordNgrams]]):
  * one native eval per document, no HOF interpretation per element.
  */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    Bpe.tokenCount(input.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bpe_chunks(text, maxTokens, overlap) → array<struct<chunk_idx,
  * start_tok, n_tokens, chunk_bytes>>: context-window chunking where the
  * budget currency is BPE TOKENS, not whitespace words — the subword
  * sibling of [[graft.ops.TextOps.chunkByTokenBudget]] with the same
  * window rule (`stride = maxTokens − overlap`; `nc = 1` for `n ≤
  * maxTokens`, else `ceil((n − maxTokens)/stride) + 1`; empty text → no
  * chunks). BPE tokens are contiguous byte slices of the document, so a
  * chunk of tokens IS a contiguous byte range — `chunk_bytes` is that
  * raw slice (byte-level chunk boundaries may split a multi-byte
  * character, exactly like chunking on real token ids; compare via
  * `hex`, not lossy string round-trips). Null in → empty, matching the
  * whitespace chunker's no-rows behavior.
  */
case class BpeChunks(child: Expression, maxTokens: Int, overlap: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  require(maxTokens > 0, s"bpe_chunks: maxTokens=$maxTokens must be positive")
  require(overlap >= 0 && overlap < maxTokens,
    s"bpe_chunks: overlap=$overlap must be in [0, maxTokens)")
  private val stride = maxTokens - overlap

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("start_tok", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("chunk_bytes", BinaryType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bpe_chunks"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Any]) else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val bounds = Bpe.segment(bytes)
    val n = bounds.length - 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val nc = if (n <= maxTokens) 1 else (n - maxTokens + stride - 1) / stride + 1
    val out = new Array[Any](nc)
    var ci = 0
    while (ci < nc) {
      val st = ci * stride
      val en = math.min(st + maxTokens, n)
      out(ci) = InternalRow(ci, st, en - st,
        java.util.Arrays.copyOfRange(bytes, bounds(st), bounds(en)))
      ci += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
