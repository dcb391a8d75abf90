package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Vector (numeric-array) expressions for the similarity-search operators.
  *
  * Implemented as native Catalyst expressions with `doGenCode` so the
  * pairwise hot path (N² candidate pairs × vector dim) stays inside
  * whole-stage codegen: no UDF serialization, no boxing, a tight primitive
  * loop over `ArrayData`. At 100 TB this is the difference between the
  * scan being compute-bound on SIMD-friendly loops vs. GC-bound on boxed
  * `WrappedArray[Float]`.
  *
  * Accepts `array<float>` or `array<double>`; computes in double. Null
  * elements count as 0. Mismatched lengths or zero norms yield NULL
  * (defensive — upstream data should not produce them).
  */
trait VectorArrayCodegen extends ImplicitCastInputTypes { self: Expression =>
  /** array<float> | array<double>; anything else (or a non-array) is an
    * AnalysisException at analysis time, with implicit casts for SQL
    * callers — not a codegen-time ClassCastException (ADVICE r01 low).
    */
  // def, not val: TypeCollection is not Serializable, and a stored val
  // ships with the expression to executors → Task not serializable.
  protected def acceptedVector: Bridge.AbstractType =
    Bridge.typeCollection(ArrayType(DoubleType), ArrayType(FloatType))

  protected def elemType(t: DataType): DataType =
    t.asInstanceOf[ArrayType].elementType

  protected def getter(elem: DataType, arr: String, i: String): String = elem match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case other => throw new IllegalStateException(s"unsupported vector element type $other")
  }

  protected def evalGet(elem: DataType, arr: ArrayData, i: Int): Double =
    if (arr.isNullAt(i)) 0.0
    else elem match {
      case FloatType => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case other => throw new IllegalStateException(s"unsupported vector element type $other")
    }

}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with VectorArrayCodegen {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(acceptedVector, acceptedVector)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (et1, et2) = (elemType(left.dataType), elemType(right.dataType))
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = evalGet(et1, x, i); val yv = evalGet(et2, y, i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (et1, et2) = (elemType(left.dataType), elemType(right.dataType))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xv = $a.isNullAt($i) ? 0.0 : ${getter(et1, a, i)};
         |    final double $yv = $b.isNullAt($i) ? 0.0 : ${getter(et2, b, i)};
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  final double $denom = Math.sqrt($nx) * Math.sqrt($ny);
         |  if ($denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorArrayCodegen {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(acceptedVector, acceptedVector)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (et1, et2) = (elemType(left.dataType), elemType(right.dataType))
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) { dot += evalGet(et1, x, i) * evalGet(et2, y, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (et1, et2) = (elemType(left.dataType), elemType(right.dataType))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ($a.isNullAt($i) ? 0.0 : ${getter(et1, a, i)})
         |          * ($b.isNullAt($i) ? 0.0 : ${getter(et2, b, i)});
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine over int8-quantized vectors (`array<tinyint>`, the
  * [[graft.ops.SimilarityOps.quantizeInt8]] output). Cosine is
  * scale-invariant, so the per-vector dequant scales cancel and the whole
  * score is integer arithmetic: dot and squared norms accumulate in
  * `long` (exact — 127² × dims overflows long only past ~5·10¹⁴
  * elements), one double divide at the end. This is the IVF probe's hot
  * kernel: the streamed candidate payload is the 1-byte-per-element qvec
  * (4× narrower than fp32) and the loop is add/multiply on ints — no
  * float loads — with fp32 exact re-rank reserved for the shortlist.
  * Null elements count as 0; mismatched lengths or a zero norm yield
  * NULL, mirroring [[CosineSimilarity]].
  */
case class Int8Cosine(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "int8_cosine"
  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L; var nx = 0L; var ny = 0L; var i = 0
    while (i < n) {
      val xv: Long = if (x.isNullAt(i)) 0L else x.getByte(i).toLong
      val yv: Long = if (y.isNullAt(i)) 0L else y.getByte(i).toLong
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    val denom = math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  long $dot = 0L; long $nx = 0L; long $ny = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $xv = $a.isNullAt($i) ? 0L : (long) $a.getByte($i);
         |    final long $yv = $b.isNullAt($i) ? 0L : (long) $b.getByte($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  final double $denom = Math.sqrt((double) $nx) * Math.sqrt((double) $ny);
         |  if ($denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** pq_adc_score(codes array<tinyint>, tables array<array<double>>) →
  * double: asymmetric-distance-computation lookup for product-quantized
  * similarity ([[graft.ops.SimilarityOps.ivfTopKPq]]) — the sum over
  * subspaces s of `tables[s][codes[s]]`, where `tables` is the per-QUERY
  * table of sub-codeword dot products and `codes` is a corpus vector's
  * m-byte PQ encoding. This is the PQ probe's hot kernel: the streamed
  * candidate payload is m bytes per corpus vector (vs 1 byte/dim int8,
  * 4 bytes/dim fp32) and scoring is m table lookups — no vector
  * arithmetic at all — so it must stay inside whole-stage codegen
  * (an interpreted HOF here would negate the point of compressing the
  * payload). Null inputs, length mismatch, a null element, or a code
  * outside its table yield NULL (defensive, mirroring the kernels
  * above).
  */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"
  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(ByteType), ArrayType(ArrayType(DoubleType)))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (codes, tables) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = codes.numElements()
    if (n != tables.numElements()) return null
    var s = 0.0; var i = 0
    while (i < n) {
      if (codes.isNullAt(i) || tables.isNullAt(i)) return null
      val c: Int = codes.getByte(i).toInt
      val t = tables.getArray(i)
      if (c < 0 || c >= t.numElements() || t.isNullAt(c)) return null
      s += t.getDouble(c); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val t = ctx.freshName("t"); val bad = ctx.freshName("bad")
      val arrayData = classOf[ArrayData].getName
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $s = 0.0; boolean $bad = false;
         |  for (int $i = 0; $i < $n && !$bad; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    final int $c = (int) $a.getByte($i);
         |    final $arrayData $t = $b.getArray($i);
         |    if ($c < 0 || $c >= $t.numElements() || $t.isNullAt($c)) { $bad = true; break; }
         |    $s += $t.getDouble($c);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vector_bytes(array<float|double>) → binary: an INJECTIVE byte layout
  * of the vector — per element a presence marker byte (0 = null element,
  * 1 = present) followed by the 8 IEEE-754 big-endian bits of the value
  * widened to double (float→double widening is exact, so a float and its
  * double widening agree; `doubleToLongBits` canonicalizes NaNs). Length
  * is implicit in the byte length (9·n), so no two distinct
  * (length, per-element value-or-null) vectors share an encoding.
  *
  * Exists for the duplicate-collapse fingerprint in
  * [[graft.ops.DedupOps.embeddingNearDupPairs]]: `md5(vector_bytes(v))`
  * keys exact-vector-equality classes from the bit pattern alone, where
  * the JSON rendering it replaces depended on float formatting (stable
  * within a JVM run, but a formatting dependency all the same). Runs once
  * per vector — off the pairwise hot path, so CodegenFallback is fine
  * (the [[HashUtil]] policy).
  */
case class VectorBytes(child: Expression)
    extends UnaryExpression with VectorArrayCodegen
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "vector_bytes"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(acceptedVector)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val et = elemType(child.dataType)
    val n = x.numElements()
    val out = new Array[Byte](9 * n)
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val off = 9 * i
        out(off) = 1
        val bits = java.lang.Double.doubleToLongBits(evalGet(et, x, i))
        var j = 0
        while (j < 8) { out(off + 1 + j) = (bits >>> (56 - 8 * j)).toByte; j += 1 }
      }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class L2Norm(child: Expression)
    extends UnaryExpression with VectorArrayCodegen {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(acceptedVector)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val et = elemType(child.dataType)
    var s = 0.0; var i = 0
    while (i < x.numElements()) { val v = evalGet(et, x, i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = elemType(child.dataType)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s"); val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  final double $v = $a.isNullAt($i) ? 0.0 : ${getter(et, a, i)};
         |  $s += $v * $v;
         |}
         |${ev.value} = Math.sqrt($s);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
