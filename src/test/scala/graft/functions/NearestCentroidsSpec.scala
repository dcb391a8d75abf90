package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** The native IVF assignment/probe kernel must be RESULT-IDENTICAL to
  * the composed Catalyst form it replaced (one cosine_sim struct node
  * per centroid + array_max / reverse(array_sort)): same cosine doubles,
  * null sims (zero-norm vector, dims-mismatched centroid) ordered below
  * every non-null sim, ties to the larger id. The composed form lives
  * here as the reference implementation — it is the SEMANTICS SPEC, kept
  * out of main because an nlist-wide expression tree is the scale cliff
  * the native kernel exists to remove (janino method limits at SemDeDup's
  * √N nlist sizing).
  */
class NearestCentroidsSpec extends SparkSuite {

  private def composed(cents: Seq[(Int, Array[Double])])(v: Column, take: Int): Column = {
    val sims = array(cents.map { case (id, c) =>
      struct(GraftFunctions.cosine_sim(v, typedLit(c)).as("sim"),
        lit(id).as("id"))
    }: _*)
    if (take == 1) array(array_max(sims))
    else slice(reverse(array_sort(sims)), 1, take)
  }

  private def vecs(dims: Int, n: Int): DataFrame = {
    import spark.implicits._
    // Includes a zero vector (all sims NULL → all-null tie-break) and
    // near-duplicate rows (sim ties at full double precision).
    (Seq.tabulate(n)(i =>
      (i.toLong, Seq.tabulate(dims)(d => math.sin(i * 13 + d * 7).toFloat))) :+
      (n.toLong, Seq.fill(dims)(0.0f)) :+
      (n + 1L, Seq.tabulate(dims)(d => math.sin(7 + d * 7).toFloat)))
      .toDF("vec_id", "v")
  }

  private def cents(dims: Int, nlist: Int): Seq[(Int, Array[Double])] =
    Seq.tabulate(nlist)(c => (c, Array.tabulate(dims)(d =>
      math.cos(c * 31 + d * 3))))

  private def check(dims: Int, nlist: Int, take: Int,
      model: Seq[(Int, Array[Double])]): Unit = {
    val df = vecs(dims, 64)
    val both = df.select(col("vec_id"),
      GraftFunctions.nearest_centroids(col("v"), model, take).as("native"),
      composed(model)(col("v"), take).as("ref"))
    val diff = both.filter(not(col("native") <=> col("ref"))).count()
    assert(diff == 0,
      s"native != composed for dims=$dims nlist=$nlist take=$take ($diff rows)")
  }

  test("native kernel ≡ composed form: assignment (take=1) and probes (take=3)") {
    val model = cents(16, 8)
    check(16, 8, take = 1, model)
    check(16, 8, take = 3, model)
  }

  test("null sims order below non-null; mismatched-dims centroid yields null sim") {
    // One centroid deliberately the wrong width: its sim is NULL for
    // every row (cosine_sim's length guard), so it may only win on the
    // zero vector's all-null tie-break (larger id wins there).
    val model = cents(16, 6) :+ (99, Array.tabulate(8)(_.toDouble))
    check(16, 7, take = 1, model)
    check(16, 7, take = 4, model)
  }

  test("take beyond nlist returns every centroid, still sorted") {
    val model = cents(16, 5)
    check(16, 5, take = 9, model)
  }

  test("property: native ≡ composed over arbitrary models and vectors (tie-heavy domain)") {
    import org.scalacheck.{Gen, Prop}
    // Components drawn from a tiny discrete set so exact cosine TIES
    // (including ±0.0 and all-null sims from zero vectors) are common —
    // the ordering edges a smooth random domain would never hit.
    val comp = Gen.oneOf(-1.0f, 0.0f, 0.5f, 1.0f)
    val gen = for {
      dims <- Gen.choose(1, 6)
      nlist <- Gen.choose(1, 6)
      take <- Gen.choose(1, 4)
      cs <- Gen.listOfN(nlist,
        Gen.listOfN(dims, comp.map(_.toDouble)).map(_.toArray))
      rows <- Gen.choose(1, 8)
      // Null vectors included: the composed form yields all-null sims
      // (cosine_sim(null, c) is NULL per centroid) — the kernel must
      // reproduce that, not emit a null array.
      vs <- Gen.listOfN(rows, Gen.option(Gen.listOfN(dims, comp)))
    } yield (dims, cs.zipWithIndex.map { case (c, i) => (i, c) }, take, vs)
    graft.PropCheck.check(Prop.forAll(gen) { case (_, model, take, vs) =>
      import spark.implicits._
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "v")
      df.select(
          GraftFunctions.nearest_centroids(col("v"), model, take).as("native"),
          composed(model)(col("v"), take).as("ref"))
        .filter(not(col("native") <=> col("ref"))).count() == 0L
    }, minSuccessful = 20) // each evaluation runs a Spark job
  }

  test("large quantizer (nlist=2048) computes in one codegen'd call") {
    // The composed form at this size is an ~2048-node expression tree —
    // the cliff the kernel removes. Only the native path runs here; the
    // equivalence is established at small nlist above (same code path,
    // model-size-independent).
    val model = cents(16, 2048)
    val out = vecs(16, 64).select(col("vec_id"),
      GraftFunctions.nearest_centroids(col("v"), model, 2).as("top"))
    assert(out.filter(size(col("top")) === 2).count() == out.count())
    // Sorted desc with distinct ids per row.
    val bad = out.filter(
      col("top")(0).getField("sim") < col("top")(1).getField("sim") ||
        col("top")(0).getField("id") === col("top")(1).getField("id")).count()
    assert(bad == 0)
  }

  test("plan object stays small at nlist=4096: the model ships by broadcast") {
    // 4096 × 64 dims × 8 B = 2 MB of raw model. Embedded in the
    // expression (the r16 design) that rides through plan serialization,
    // explain/UI plumbing, and EVERY task-binary rebuild; as a broadcast
    // handle the serialized expression stays O(100 B) at any nlist.
    val model = cents(64, 4096)
    val e = Bridge.expression(GraftFunctions.nearest_centroids(col("v"), model, 1))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(e); oos.close()
    assert(bos.size() < 64 * 1024,
      s"serialized expression is ${bos.size()} B — the model leaked into the plan object")
    // And the broadcast path still EXECUTES: every row lands on a valid list.
    val assigned = graft.ops.SimilarityOps.assignListIds(
      vecs(64, 32).withColumnRenamed("v", "cv"), model, vecCol = "cv")
    assert(assigned.filter(col("list_id") >= 0 && col("list_id") < 4096).count()
      == assigned.count())
  }

  test("sim comparator: ±0.0 is a tie (id breaks it), NaN largest and self-equal") {
    // Spark's nanSafeCompareDoubles semantics — what array_sort applies
    // to the composed form. java.lang.Double.compare alone would order
    // -0.0 < 0.0 and flip the ±0.0 tie away from the id tie-break.
    val e = Bridge.expression(
      GraftFunctions.nearest_centroids(col("v"), cents(4, 2), 1))
      .asInstanceOf[NearestCentroids]
    assert(e.beats(false, -0.0, 5, false, 0.0, 3))
    assert(!e.beats(false, -0.0, 3, false, 0.0, 5))
    assert(e.beats(false, 0.0, 5, false, -0.0, 3))
    assert(e.beats(false, Double.NaN, 1, false, 1.0, 9))
    assert(e.beats(false, Double.NaN, 9, false, Double.NaN, 3))
    assert(!e.beats(false, Double.NaN, 3, false, Double.NaN, 9))
    // Null sims stay smallest regardless of the non-null sim's value.
    assert(e.beats(false, -1e300, 0, true, 0.0, 9))
  }

  test("topKNull orders Int.MinValue id LAST (arbitrary public-API ids)") {
    // sortBy(-_) negation is the identity on Int.MinValue and would have
    // mis-ordered it first; the kernel sorts with Ordering.Int.reverse.
    val model = Seq(Int.MinValue, 0, 7).map(id => (id, Array.fill(4)(1.0)))
    val e = Bridge.expression(
      GraftFunctions.nearest_centroids(col("v"), model, 3))
      .asInstanceOf[NearestCentroids]
    val out = e.topKNull()
    val ids = (0 until out.numElements()).map(i => out.getStruct(i, 2).getInt(1))
    assert(ids == Seq(7, 0, Int.MinValue))
  }

  test("structurally-equal models share ONE broadcast (content-keyed cache)") {
    // Two loads of the same model file produce structurally-equal but
    // identity-distinct Seq/array instances; the r17 weak identity key
    // missed and re-broadcast per load (VERDICT r17 #3). Deep-copy a
    // model and require both expressions hold the same Broadcast id —
    // and a genuinely DIFFERENT model must not collide.
    val m1 = cents(8, 4)
    val m2 = m1.map { case (id, v) => (id, v.clone()) }
    def bcId(m: Seq[(Int, Array[Double])]): Long =
      Bridge.expression(GraftFunctions.nearest_centroids(col("v"), m, 1))
        .asInstanceOf[NearestCentroids].model.id
    assert(bcId(m1) == bcId(m2),
      "structurally-equal models broadcast twice — the cache key is identity-based")
    val m3 = m1.map { case (id, v) =>
      (id, v.clone()) } match {
      case (id, v) +: rest => (id, { v(0) += 1.0; v }) +: rest
    }
    assert(bcId(m1) != bcId(m3), "distinct models collided in the broadcast cache")
  }
}
