package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** nearest_centroids(vec) → array<struct<sim, id>>: the `take`
  * most-cosine-similar centroids of a trained coarse quantizer, sorted
  * (sim DESC, id DESC) — the IVF-family assignment/probe kernel
  * ([[graft.ops.SimilarityOps.assignListIds]]/`probeListIds`).
  *
  * Why a native expression and not the composed
  * `slice(reverse(array_sort(array(struct(cosine_sim(v, c), id)...))))`
  * tree it replaces: that tree is one Catalyst node chain PER CENTROID,
  * and the quantizer's size is a scale knob — SemDeDup's √N sizing rule
  * puts nlist in the tens of thousands at corpus scale, where an
  * nlist-wide expression tree blows past janino's method limits and
  * knocks the corpus-sized assignment projection out of whole-stage
  * codegen (the exact failure mode the PQ kernels already solved, and at
  * 16×64×4-node scale the LSH signature did too). Here the model rides
  * as a constructor reference object (nlist×dims doubles — broadcast
  * with the plan) and each row costs one tight nlist×dims loop plus a
  * bounded `take`-insertion, independent of nlist in PLAN size.
  *
  * Result contract (spec-pinned equal to the composed form): sims are
  * [[CosineSimilarity]] doubles — the query-side norm folds out once per
  * row (same double: √ is correctly rounded and the per-centroid norms
  * are the same products summed in the same order); a zero-norm vector
  * or a dims-mismatched centroid yields a NULL sim, which orders BELOW
  * every non-null sim exactly as Spark's struct ordering places null
  * fields first ascending; ties (including all-null) break to the
  * LARGER id, matching `array_max`/`reverse(array_sort(...))` on
  * (sim, id) structs. A NULL input vector behaves as the composed form
  * does — every per-centroid cosine is NULL, so the result is the
  * all-null-sim id-descending array, NOT a null output (the expression
  * is non-nullable, like the array constructor it replaces).
  * Comparisons use java.lang.Double.compare — Spark's own double
  * ordering (NaN largest, -0.0 < 0.0), though cosine here never
  * produces NaN.
  */
case class NearestCentroids(child: Expression,
    centroids: Seq[(Int, Array[Double])], take: Int)
    extends UnaryExpression with VectorArrayCodegen {
  require(take >= 1, s"take must be >= 1, got $take")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sim", DoubleType, nullable = true),
    StructField("id", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "nearest_centroids"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(acceptedVector)

  @transient private lazy val ids: Array[Int] = centroids.map(_._1).toArray
  @transient private lazy val vecs: Array[Array[Double]] = centroids.map(_._2).toArray
  // √Σc² per centroid, precomputed once per (driver) construction — the
  // same double CosineSimilarity recomputes per pair (same products,
  // same left-to-right order, correctly-rounded √).
  @transient private lazy val norms: Array[Double] =
    vecs.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) topKNull() else topK(v.asInstanceOf[ArrayData])
  }

  /** The composed form's null-vector result: every sim NULL, ids
    * descending — reached for a NULL input (cosine_sim(null, c) is NULL
    * per centroid in the tree this replaces). */
  def topKNull(): ArrayData = {
    val k = math.min(take, ids.length)
    val sorted = ids.sortBy(-_).take(k)
    new GenericArrayData(sorted.map(id =>
      InternalRow(null, id): Any))
  }

  /** (simIsNull, sim, id) `a` strictly beats `b` under (sim DESC, id
    * DESC) with null sims smallest. */
  private def beats(aNull: Boolean, aSim: Double, aId: Int,
      bNull: Boolean, bSim: Double, bId: Int): Boolean =
    if (aNull != bNull) bNull
    else if (!aNull && java.lang.Double.compare(aSim, bSim) != 0)
      java.lang.Double.compare(aSim, bSim) > 0
    else aId > bId

  def topK(x: ArrayData): ArrayData = {
    val et = elemType(child.dataType)
    val n = x.numElements()
    // Materialize the vector into a primitive array during the norm
    // pass: the centroid loop below reads it nlist times, and per-read
    // evalGet (type match + null-bitset check) in the hot loop would
    // waste exactly the work this kernel exists to save at large nlist.
    val xv = new Array[Double](n)
    var nx = 0.0
    var i = 0
    while (i < n) { val v = evalGet(et, x, i); xv(i) = v; nx += v * v; i += 1 }
    val sx = math.sqrt(nx)
    val k = math.min(take, vecs.length)
    // Bounded insertion buffer, kept sorted best-first — k is 1
    // (assignment) or nprobe (small), so O(nlist·k) with no allocation
    // beyond the result.
    val bNull = new Array[Boolean](k)
    val bSim = new Array[Double](k)
    val bId = new Array[Int](k)
    var filled = 0
    var c = 0
    while (c < vecs.length) {
      val cv = vecs(c)
      var isNull = true
      var sim = 0.0
      if (cv.length == n) {
        var dot = 0.0
        var j = 0
        while (j < n) { dot += xv(j) * cv(j); j += 1 }
        val denom = sx * norms(c)
        if (denom != 0.0) { isNull = false; sim = dot / denom }
      }
      val id = ids(c)
      // Insert if the buffer has room or this beats the current worst.
      if (filled < k || beats(isNull, sim, id,
          bNull(filled - 1), bSim(filled - 1), bId(filled - 1))) {
        var pos = if (filled < k) filled else k - 1
        while (pos > 0 && beats(isNull, sim, id,
            bNull(pos - 1), bSim(pos - 1), bId(pos - 1))) {
          bNull(pos) = bNull(pos - 1); bSim(pos) = bSim(pos - 1)
          bId(pos) = bId(pos - 1); pos -= 1
        }
        bNull(pos) = isNull; bSim(pos) = sim; bId(pos) = id
        if (filled < k) filled += 1
      }
      c += 1
    }
    val out = new Array[Any](filled)
    i = 0
    while (i < filled) {
      out(i) = InternalRow(if (bNull(i)) null else java.lang.Double.valueOf(bSim(i)),
        bId(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroids].getName)
    val childGen = child.genCode(ctx)
    val arrayData = classOf[ArrayData].getName
    // Non-nullable output with an explicit null branch: a NULL vector
    // takes the composed form's all-null-sim result, not a null array.
    ev.copy(code = code"""
      |${childGen.code}
      |$arrayData ${ev.value} = ${childGen.isNull}
      |  ? $ref.topKNull() : $ref.topK(${childGen.value});
      """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
