package graft.tools

import java.nio.file.{Files, Path, Paths}

import graft.Sessions
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Build a LINEARLY-scaled test-data directory from an existing sf dir —
  * the input for a full-registry bench at 10× the largest driver-shipped
  * SF (VERDICT r16 #5: the ×10/×100 ScaleProbe covers the dedup/ANN
  * algebra under replication, but the whole 125-query registry had only
  * ever been timed at sf0.1; a single sf1 line catches any query whose
  * constant is fine at 600k rows and wrong at 6M).
  *
  * This is deliberately NOT [[ScaleProbe.replicateDir]]: that tool
  * replicates documents/embeddings verbatim, creating factor-copy dup
  * classes — the dup-heavy regime where the true dedup answer (and so
  * the wall time) grows QUADRATICALLY in multiplicity, which is exactly
  * what its expansion-algebra assertions price. A bench line needs the
  * opposite: a corpus whose true workload grows ~linearly with rows, so
  * "no query super-linear vs sf0.1" is a meaningful assertion about
  * constants rather than about answer volume. Hence each replica is
  * PERTURBED:
  *
  *  - `documents.text`: replica 0 is the base corpus verbatim; replica
  *    k > 0 suffixes every whitespace token with `~k` — shingle sets,
  *    token bags, paragraph fingerprints, and n-grams become disjoint
  *    across replicas (no cross-replica exact/near/paragraph/substring
  *    dups), while WITHIN a replica the dup structure of the base corpus
  *    is reproduced exactly (a base near-dup pair's two texts get the
  *    same suffixing, preserving their Jaccard). `n_chars` is recomputed.
  *  - `embeddings.embedding`: replica k circularly rotates the vector by
  *    k·7 positions. Rotation is an orthogonal map, so WITHIN a replica
  *    every cosine is preserved bit-for-bit structurally (the dup/ANN
  *    topology of the base corpus repeats per replica) while
  *    cross-replica cosines are scrambled below any dedup threshold.
  *    The rotation alone has period dims (gcd(7, 64) = 1 ⇒ 64 distinct
  *    shifts for 64-dim vectors), so past factor = dims a second
  *    orthogonal layer keeps replicas distinct: replicas in rotation
  *    block b = k div dims (b > 0) also flip each dimension's sign by a
  *    hash of (b, i). Sign flips preserve within-replica dots EXACTLY
  *    ((-x)·(-y) = x·y in IEEE) while decorrelating k from k+dims, so
  *    strict linearity in distinct vectors holds at any factor; block 0
  *    is the identity, so factor ≤ dims builds are byte-identical to
  *    the rotation-only form.
  *  - fact tables (`customer supplier part orders lineitem events`):
  *    ids shift by `orig * factor + k` consistently across foreign keys,
  *    so joins keep exactly their base selectivity and referential
  *    integrity at factor× volume.
  *  - `region`/`nation` symlink unchanged — constant-size dimensions do
  *    not scale with SF (the TPC-H convention), and every nationkey
  *    stays resolvable.
  *
  * Usage: `runMain graft.tools.MakeSf <baseDir> <outDir> [factor=10]`.
  * Refuses to wipe a non-empty outDir it did not create (same ownership
  * marker contract as ScaleProbe).
  */
object MakeSf {

  val Marker = "_GRAFT_MAKESF"

  /** (table, columns to shift as orig*factor+k). */
  private val keyShifts: Map[String, Seq[String]] = Map(
    "customer.parquet" -> Seq("c_custkey"),
    "supplier.parquet" -> Seq("s_suppkey"),
    "part.parquet" -> Seq("p_partkey"),
    "orders.parquet" -> Seq("o_orderkey", "o_custkey"),
    "lineitem.parquet" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events.parquet" -> Seq("event_id", "user_id"),
    "documents.parquet" -> Seq("doc_id"),
    "embeddings.parquet" -> Seq("vec_id"))

  def build(spark: SparkSession, baseDir: String, outDir: String, factor: Int): Unit = {
    require(factor >= 2, s"factor must be >= 2, got $factor")
    val out = Paths.get(outDir)
    val marker = out.resolve(Marker)
    if (Files.exists(out)) {
      val empty = { val s = Files.list(out); try !s.findAny().isPresent finally s.close() }
      require(empty || Files.exists(marker),
        s"MakeSf: refusing to wipe non-empty '$outDir' — it lacks the $Marker marker")
      Files.walk(out).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
    Files.createDirectories(out)
    // The marker records the build parameters so a consumer reusing the
    // directory (LinearProbe --reuse) can verify it matches its ask.
    Files.writeString(marker,
      s"scaled test-data directory written by graft.tools.MakeSf\n" +
        s"base=${Paths.get(baseDir).toAbsolutePath.normalize()}\nfactor=$factor\n")

    val base = Paths.get(baseDir).toAbsolutePath.normalize()
    val listing = Files.list(base)
    try listing.forEach { p =>
      if (!keyShifts.contains(p.getFileName.toString))
        Files.createSymbolicLink(out.resolve(p.getFileName), p)
    } finally listing.close()

    keyShifts.foreach { case (table, shiftCols) =>
      val df = spark.read.parquet(s"$baseDir/$table")
      val exploded = df.select(
        explode(array((0 until factor).map(lit): _*)).as("_k"), col("*"))
      val shifted = shiftCols.foldLeft(exploded) { (d, c) =>
        d.withColumn(c, col(c) * factor + col("_k"))
      }
      val perturbed = table match {
        case "documents.parquet" =>
          // Replica 0 verbatim; k>0 suffixes every \S+ token with ~k.
          // \S+ never crosses newlines, so paragraph structure survives.
          shifted
            .withColumn("text", when(col("_k") === 0, col("text")).otherwise(
              regexp_replace(col("text"), lit("(\\S+)"),
                concat(lit("$1~"), col("_k").cast("string")))))
            .withColumn("n_chars", length(col("text")).cast("long"))
        case "embeddings.parquet" =>
          // Circular rotation by k*7 (mod dims); k=0 is the identity.
          val dims = size(col("embedding"))
          val shift = pmod(col("_k") * 7, dims)
          val rotated =
            when(shift === 0, col("embedding")).otherwise(
              concat(slice(col("embedding"), shift + 1, dims - shift),
                slice(col("embedding"), lit(1), shift)))
          // Per-block sign layer (see scaladoc): block b = k div dims;
          // b = 0 is the identity, b > 0 flips dimension i's sign when
          // xxhash64(b, i) is odd — orthogonal, so within-replica dots
          // are preserved bit-for-bit while k and k+dims decorrelate.
          val block = floor(col("_k") / dims).cast("int")
          shifted.withColumn("embedding",
            when(block === 0, rotated).otherwise(
              zip_with(rotated, sequence(lit(0), dims - 1), (x, i) =>
                (x.cast("double") * (lit(1) - lit(2) *
                  pmod(xxhash64(block, i), lit(2)).cast("int"))).cast("float"))))
        case _ => shifted
      }
      perturbed.drop("_k")
        .repartition(spark.sessionState.conf.numShufflePartitions)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$table")
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MakeSf <baseDir> <outDir> [factor=10]")
    val factor = if (args.length >= 3) args(2).toInt else 10
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    try build(spark, args(0), args(1), factor)
    finally spark.stop()
    println(s"MakeSf: wrote ${args(1)} = ${args(0)} x$factor")
  }
}
