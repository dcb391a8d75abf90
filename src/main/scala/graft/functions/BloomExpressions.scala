package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Broadcast Bloom gate for asymmetric batch-vs-reference joins
  * ([[graft.ops.DedupOps.jaccardPairsAgainstRef]]): build a fixed-size
  * Bloom filter over the (small) BATCH side's join keys with
  * [[BloomAgg]], broadcast the one-row result, and drop reference-side
  * rows whose key cannot match ([[BloomMightContain]]) BEFORE the
  * reference corpus shuffles into the join. A Bloom filter has no false
  * negatives, so the gate is result-identical by construction — false
  * positives only let some unmatchable rows through — while the
  * reference-side shuffle shrinks from corpus-sized to
  * ~batch-matched-sized at any corpus scale.
  *
  * Self-describing layout (so the check side needs no parameters):
  * `int numBits | int numHashes | bit bytes`. Bits come from double
  * hashing (Kirsch–Mitzenmacher): probe i tests bit
  * `(h1 + i·h2) mod numBits` with h1/h2 independent splitmix64 mixes of
  * the key — fully deterministic, replayable across JVMs.
  */
object BloomCodec {
  val HeaderBytes = 8

  def create(numBits: Int, numHashes: Int): Array[Byte] = {
    require(numBits > 0, s"bloom numBits=$numBits must be > 0")
    require(numHashes >= 1 && numHashes <= 16, s"bloom numHashes=$numHashes outside 1..16")
    val out = new Array[Byte](HeaderBytes + ((numBits + 7) >>> 3))
    writeInt(out, 0, numBits); writeInt(out, 4, numHashes)
    out
  }

  @inline private def writeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  @inline private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def add(bloom: Array[Byte], v: Long): Unit = {
    val numBits = readInt(bloom, 0); val numHashes = readInt(bloom, 4)
    val h1 = mix(v)
    val h2 = mix(v ^ 0x6a09e667f3bcc909L) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
      bloom(HeaderBytes + (bit >>> 3)) =
        (bloom(HeaderBytes + (bit >>> 3)) | (1 << (bit & 7))).toByte
      i += 1
    }
  }

  def mightContain(bloom: Array[Byte], v: Long): Boolean = {
    val numBits = readInt(bloom, 0); val numHashes = readInt(bloom, 4)
    val h1 = mix(v)
    val h2 = mix(v ^ 0x6a09e667f3bcc909L) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
      if ((bloom(HeaderBytes + (bit >>> 3)) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** In-place OR of `other` into `acc` (same parameters required). Set
    * bits depend only on the values added, so merge(bloom(A), bloom(B))
    * is byte-identical to bloom(A ∪ B) — the mergeability the partial
    * aggregation relies on.
    */
  def mergeInto(acc: Array[Byte], other: Array[Byte]): Array[Byte] = {
    require(acc.length == other.length &&
      readInt(acc, 0) == readInt(other, 0) && readInt(acc, 4) == readInt(other, 4),
      "bloom merge: mismatched filter parameters")
    var i = HeaderBytes
    while (i < acc.length) { acc(i) = (acc(i) | other(i)).toByte; i += 1 }
    acc
  }
}

/** bloom_agg(key, numBits, numHashes) → binary: the Bloom filter of all
  * non-null LONG keys in the group (map-side partial blooms OR-merge).
  * Fixed `numBits/8` bytes of state however many keys stream through —
  * size it for the expected BATCH key cardinality
  * (fpp ≈ (1 − e^(−k·n/m))^k; the 2²²-bit default holds ~400k keys at
  * k=5 under 1% fp). The buffer IS the wire format, so
  * serialize/deserialize are copies.
  */
case class BloomAgg(child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  override def prettyName: String = "bloom_agg"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] =
    BloomCodec.create(numBits, numHashes)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomCodec.add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    BloomCodec.mergeInto(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): BloomAgg =
    copy(child = c)
}

/** bloom_might_contain(bloom, key) → boolean: true iff `key` may be in
  * the filter (definitely-absent keys return false — never a false
  * negative). The reference-corpus-sized gate filter, so it stays inside
  * whole-stage codegen: per row two header reads plus `numHashes` byte
  * probes, no allocation, no deserialization (the bit bytes are probed
  * in place).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def prettyName: String = "bloom_might_contain"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(BinaryType, LongType)
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType

  override def nullSafeEval(bloom: Any, v: Any): Any =
    BloomCodec.mightContain(bloom.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codec = BloomCodec.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $codec.mightContain($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
