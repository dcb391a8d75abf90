package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Product-quantization model kernels for
  * [[graft.ops.SimilarityOps.ivfTopKPq]]. The trained codebook rides
  * along as a CONSTRUCTOR parameter (model-sized: m·ksub·dsub doubles)
  * and the generated code is a single call into the compiled Scala loop
  * via `addReferenceObj` — the expression-tree formulation (m·ksub
  * struct/dot/CASE nodes) blew past janino's method limits at 256
  * codewords and knocked the corpus-sized encode projection out of
  * whole-stage codegen entirely, which is exactly backwards for the one
  * pass that touches every vector.
  *
  * Shared arithmetic contract (must match [[PqTables]] /
  * [[PqAdcScore]]): vectors score as UNIT vectors with the
  * normalization folded in — `score(s, j) = 2·⟨v_s, c⟩/‖v‖ − ‖c‖²`
  * (the argmax of which is the argmin of ‖v̂_s − c‖²); a zero-norm
  * vector scores `−‖c‖²` everywhere, i.e. encodes as the zero unit
  * vector. Dots accumulate left-to-right in double; ties pick the
  * SMALLEST code. Null elements read as 0 (the VectorArrayCodegen
  * convention).
  */
trait PqModelExpression extends VectorArrayCodegen { self: UnaryExpression =>
  /** codebooks(s)(j) = sub-centroid of subspace s, all `dsub` wide. */
  def codebooks: Seq[Seq[Array[Double]]]

  @transient protected lazy val m: Int = codebooks.length
  @transient protected lazy val dsub: Int =
    if (m == 0 || codebooks.head.isEmpty) 0 else codebooks.head.head.length
  /** ‖c‖² per codeword, precomputed once per (driver) construction. */
  @transient protected lazy val normSq: Array[Array[Double]] =
    codebooks.map(_.map(c => { var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }; s }).toArray).toArray

  protected def vectorNorm(x: ArrayData, et: DataType): Double = {
    var ss = 0.0; var i = 0
    val n = x.numElements()
    while (i < n) { val v = evalGet(et, x, i); ss += v * v; i += 1 }
    math.sqrt(ss)
  }

  protected def subDot(x: ArrayData, et: DataType, s: Int, c: Array[Double]): Double = {
    val off = s * dsub
    val n = x.numElements()
    var dot = 0.0; var t = 0
    while (t < dsub && off + t < n) { dot += evalGet(et, x, off + t) * c(t); t += 1 }
    dot
  }
}

/** pq_encode(vec) → array<tinyint>: the m PQ codes of a raw vector under
  * the constructor codebook — the corpus-side encode pass (one per
  * vector, whole-stage codegen'd via the reference-object call).
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Array[Double]]])
    extends UnaryExpression with PqModelExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(acceptedVector)

  override def nullSafeEval(a: Any): Any = encode(a.asInstanceOf[ArrayData])

  def encode(x: ArrayData): ArrayData = {
    val et = elemType(child.dataType)
    val nrm = vectorNorm(x, et)
    val codes = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val words = codebooks(s)
      var best = Double.NegativeInfinity; var bi = 0; var j = 0
      while (j < words.length) {
        val n2 = normSq(s)(j)
        val sc = if (nrm > 0.0) subDot(x, et, s, words(j)) * 2 / nrm - n2 else -n2
        if (sc > best) { best = sc; bi = j }
        j += 1
      }
      codes(s) = bi.toByte
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encode($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_tables(vec) → array<array<double>>: the per-QUERY ADC lookup table
  * — tables[s][j] = ⟨q̂_s, c_{s,j}⟩ — consumed positionally by
  * [[PqAdcScore]]. Query-side only (m·ksub doubles per row, broadcast
  * with the probes).
  */
case class PqTables(child: Expression, codebooks: Seq[Seq[Array[Double]]])
    extends UnaryExpression with PqModelExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_tables"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(acceptedVector)

  override def nullSafeEval(a: Any): Any = tables(a.asInstanceOf[ArrayData])

  def tables(x: ArrayData): ArrayData = {
    val et = elemType(child.dataType)
    val nrm = vectorNorm(x, et)
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val words = codebooks(s)
      val row = new Array[Double](words.length)
      var j = 0
      while (j < words.length) {
        row(j) = if (nrm > 0.0) subDot(x, et, s, words(j)) / nrm else 0.0
        j += 1
      }
      out(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTables", this, classOf[PqTables].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.tables($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
