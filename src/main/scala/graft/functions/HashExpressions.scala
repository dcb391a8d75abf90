package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Stable, engine-independent hashing primitives for dedup operators.
  *
  * Deliberately NOT Spark's murmur3 `hash()` / `xxhash64()`: simhash here is
  * md5-derived so an external oracle (DuckDB, any engine with md5) can
  * recompute identical fingerprints, and fnv64 is a 10-line spec any system
  * can reimplement. These run once per document (not per candidate pair),
  * so CodegenFallback is fine — they are off the pairwise hot path.
  */
object HashUtil {
  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** splitmix64 finalizer (Steele et al.) — used to derive the k MinHash
    * functions from one base hash.
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val md5Local = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val HexDigits = "0123456789abcdef".toCharArray

  def md5Hex(bytes: Array[Byte]): String = {
    val d = md5Local.get(); d.reset()
    val out = d.digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < out.length) {
      sb.append(HexDigits((out(i) >> 4) & 0xf)); sb.append(HexDigits(out(i) & 0xf)); i += 1
    }
    sb.toString
  }

  /** 60-bit token hash: first 15 hex chars of md5, parsed base-16. The
    * 15-char (not 16) width keeps the value inside a signed 64-bit long so
    * SQL engines without unsigned types reproduce it exactly.
    */
  def md5Hash60(tokenUtf8: Array[Byte]): Long =
    java.lang.Long.parseLong(md5Hex(tokenUtf8).substring(0, 15), 16)

  /** 60-bit SimHash over all token occurrences (weight = occurrence count;
    * tie on a bit-majority of exactly 0 → bit 0).
    */
  def simhash60(tokens: Iterator[Array[Byte]]): Long = {
    val acc = new Array[Int](60)
    while (tokens.hasNext) {
      val h = md5Hash60(tokens.next())
      var j = 0
      while (j < 60) { acc(j) += (if (((h >> j) & 1L) == 1L) 1 else -1); j += 1 }
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (acc(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Winnowing fingerprints (MOSS): hash every word-`k`-gram shingle with
    * [[md5Hash60]], slide a window of `w` consecutive hashes, keep each
    * window's minimum, dedupe preserving first occurrence. Bit-exact twin
    * of the higher-order-function formulation in
    * [[graft.ops.TextOps.winnowFingerprintsHof]] (shingles joined with a
    * single space, null tokens skipped like `concat_ws`) — the DuckDB
    * oracle reproduces both. Fewer than k+w-1 tokens → empty.
    */
  def winnowFingerprints(toks: Array[Array[Byte]], k: Int, w: Int): Array[Long] = {
    val nShingles = toks.length - k + 1
    if (nShingles < w) return Array.emptyLongArray
    val space = ' '.toByte
    val hashes = new Array[Long](nShingles)
    var i = 0
    while (i < nShingles) {
      // concat_ws semantics: null tokens are skipped, separator only
      // between kept tokens.
      var len = 0
      var cnt = 0
      var j = 0
      while (j < k) {
        val t = toks(i + j)
        if (t != null) { len += t.length; cnt += 1 }
        j += 1
      }
      val buf = new Array[Byte](len + math.max(cnt - 1, 0))
      var p = 0
      var first = true
      j = 0
      while (j < k) {
        val t = toks(i + j)
        if (t != null) {
          if (!first) { buf(p) = space; p += 1 }
          System.arraycopy(t, 0, buf, p, t.length); p += t.length
          first = false
        }
        j += 1
      }
      hashes(i) = md5Hash60(buf)
      i += 1
    }
    // O(m·w) window minima (w is tiny); LinkedHashSet = array_distinct's
    // first-occurrence order.
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= nShingles - w) {
      var m = hashes(i)
      var j = 1
      while (j < w) { if (hashes(i + j) < m) m = hashes(i + j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** k-minima MinHash signature over a token set. Empty input → all
    * Long.MaxValue — which means every empty input shares ONE identical
    * signature (and therefore every band key): callers doing banded
    * candidate joins must filter empty token sets out first, or E empty
    * docs generate O(E²) candidate pairs ([[graft.ops.DedupOps]] does).
    */
  def minhashSignature(tokens: Iterator[Array[Byte]], k: Int, seed: Long): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    while (tokens.hasNext) {
      val base = fnv64(tokens.next())
      var i = 0
      while (i < k) {
        val h = mix64(base ^ mix64(seed + i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }
}

/** simhash60(array<string>) → long. */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val it = (0 until arr.numElements()).iterator
      .filterNot(arr.isNullAt)
      .map(i => arr.getUTF8String(i).getBytes)
    HashUtil.simhash60(it)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash_signature(array<string>, k, seed) → array<long>. */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  require(k > 0, "minhash_signature: k must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val it = (0 until arr.numElements()).iterator
      .filterNot(arr.isNullAt)
      .map(i => arr.getUTF8String(i).getBytes)
    new GenericArrayData(HashUtil.minhashSignature(it, k, seed))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** winnow_fps60(array<string> tokens, k, w) → array<long>.
  *
  * Native straightline twin of the HOF winnowing pipeline
  * ([[graft.ops.TextOps.winnowFingerprintsHof]], spec-asserted equal):
  * the nested interpreted HOF tree (transform→sequence→slice→array_min
  * per window) costs ~2 ms per 300-char document and degrades further as
  * JIT call sites go megamorphic, which made winnow-gated dedup the
  * slowest family in the suite; one eval call per document removes that
  * entirely while keeping md5-prefix hashes the oracle can reproduce.
  */
case class WinnowFps60(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  require(k > 0 && w > 0, s"winnow_fps60: k=$k w=$w must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps60"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))

  // Null token array → EMPTY fingerprint set, matching the HOF twin
  // (whose null `when` condition falls through to the empty branch) and
  // the DuckDB oracle's CASE.
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.emptyLongArray) else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val toks = new Array[Array[Byte]](arr.numElements())
    var i = 0
    while (i < toks.length) {
      if (!arr.isNullAt(i)) toks(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    new GenericArrayData(HashUtil.winnowFingerprints(toks, k, w))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** fnv64(string) → long. */
case class Fnv64(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    HashUtil.fnv64(input.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
