package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Random-hyperplane (SimHash-for-vectors) LSH signature: `bits`-bit long
  * for hash table `table`, over a float/double vector column.
  *
  * A native expression instead of a composed column tree: the naive
  * `(0 until bits).map(b => (0 until dims).map(d => ±element_at(v,d)).reduce(_+_))`
  * construction builds a bits×dims-node Catalyst tree (4096 nodes for
  * 16×64×4 tables) whose planning/codegen dominated the whole benchmark
  * (~40 s at sf0.1). Here the hyperplane sign matrix is derived once per
  * operator instance (deterministic splitmix64 — reproducible across JVMs,
  * no stored model) and each row costs one tight bits×dims loop.
  */
case class HyperplaneLshSignature(child: Expression, bits: Int, table: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  require(bits > 0 && bits <= 63, "bits must be in [1, 63]")

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_signature"
  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(Bridge.typeCollection(ArrayType(DoubleType), ArrayType(FloatType)))

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Sign matrix [bit][dim], materialized lazily at the observed dimension
  // (executor-side, after serialization — hence @transient).
  @transient private var signs: Array[Array[Byte]] = _
  @transient private var signDims: Int = -1

  private def signsFor(dims: Int): Array[Array[Byte]] = {
    if (signs == null || signDims != dims) {
      signs = Array.tabulate(bits, dims) { (b, d) =>
        val bit = table * bits + b
        if (HashUtil.mix64(0x5ee9L * (bit.toLong << 20) + d) < 0) (-1).toByte else 1.toByte
      }
      signDims = dims
    }
    signs
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val sg = signsFor(dims)
    val isFloat = elemIsFloat
    var sig = 0L
    var b = 0
    while (b < bits) {
      val row = sg(b)
      var dot = 0.0
      var d = 0
      while (d < dims) {
        if (!arr.isNullAt(d)) {
          val v = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
          dot += (if (row(d) > 0) v else -v)
        }
        d += 1
      }
      if (dot > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
