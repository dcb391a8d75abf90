package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with a typed metadata struct, processed batch-wise in executors.
  *
  * The Spark-side plumbing — schema, partition-parallel batch iteration,
  * record shape — is real and tested; the actual media decode is STUBBED
  * with a deterministic fake (this container has no image/audio codecs):
  * `decodeStub` derives "features" purely from the byte payload, so the
  * pipeline is reproducible and oracle-checkable end to end. A real codec
  * plugs in through the [[MediaDecoder]] reflection seam — a classpath/
  * property change at deploy time, zero code change here.
  *
  * Scale notes: records flow through `mapPartitions` in micro-batches of
  * `DecodeBatchSize` (the shape a vectorized decoder wants — amortizes
  * model/codec init per batch, not per row), and the map is stateless so
  * Spark can repartition freely upstream; no shuffle is introduced.
  */
object MultimodalOps {

  val DecodeBatchSize = 64

  /** A multimodal record: opaque payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte],
      format: String, n_bytes: Int)

  /** Stub "decoded features" — deterministic functions of the payload
    * (md5, size-derived fake dimensions). A real decoder would return
    * width/height/duration/frames from the codec instead.
    */
  final case class DecodedMedia(doc_id: Long, n_bytes: Int, format: String,
      fake_width: Int, fake_height: Int, fake_frames: Long, content_md5: String)

  /** documents.text → (binary payload, metadata) — the ingest shape for any
    * media column (same opaque-binary model as the MQ `value` column,
    * SURVEY.md §1.2).
    */
  def toMediaRecords(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("utf8-text").as("format"),
      length(encode(col("text"), "UTF-8")).as("n_bytes"))

  /** The codec seam: a real vectorized decoder implements this and is
    * resolved REFLECTIVELY once per executor JVM — from the class named
    * by [[MediaDecoder.DecoderClassProp]], else the well-known
    * `graft.media.NativeMediaDecoder` — so a codec-capable environment
    * upgrades by dropping a jar on the classpath (or setting the
    * property), never by a code change here. When neither resolves, the
    * deterministic [[decodeStub]] backs the pipeline (this container has
    * no codecs); the stub path remains the oracle/CI truth.
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[DecodedMedia]
  }

  object MediaDecoder {
    /** System property naming a [[MediaDecoder]] implementation (no-arg
      * constructor). EXPLICIT misconfiguration fails loudly — silent
      * stub fallback is reserved for the absent well-known default.
      */
    val DecoderClassProp = "graft.media.decoder.class"
    val WellKnownClass = "graft.media.NativeMediaDecoder"

    private[ops] val stub: MediaDecoder = new MediaDecoder {
      override def decodeBatch(batch: Seq[MediaRecord]): Seq[DecodedMedia] =
        batch.map(decodeStub)
    }

    // Per-JVM cache keyed by (explicitly-configured?, class name):
    // executor-side resolve() runs once per partition but reflection only
    // once per key. Keying on the name alone would let an unconfigured
    // stub-fallback (cached under the well-known name) silently satisfy a
    // LATER explicit property naming that same name — serving the stub
    // where the contract promises a loud ClassNotFoundException.
    @volatile private var cached: Option[((Boolean, String), MediaDecoder)] = None

    /** Load through the thread CONTEXT classloader first (Spark's
      * `Utils.classForName` pattern): decoder jars shipped via `--jars`/
      * `spark.jars` land in the executor's MutableURLClassLoader, which is
      * the task thread's context loader but NOT an ancestor of the loader
      * that defined this class — defining-loader-only resolution would
      * silently stub out exactly that documented deploy path. Falls back
      * to the defining loader (null context CL, or flat-classpath runs
      * where only it sees the class).
      */
    private def loadClass(name: String): Class[_] = {
      val defining = getClass.getClassLoader
      Option(Thread.currentThread().getContextClassLoader) match {
        case Some(ctx) =>
          try Class.forName(name, true, ctx)
          catch { case _: ClassNotFoundException => Class.forName(name, true, defining) }
        case None => Class.forName(name, true, defining)
      }
    }

    def resolve(): MediaDecoder = {
      val configured = Option(System.getProperty(DecoderClassProp))
      val want = configured.getOrElse(WellKnownClass)
      val key = (configured.isDefined, want)
      cached match {
        case Some((k, d)) if k == key => d
        case _ =>
          val d =
            try loadClass(want).getDeclaredConstructor()
              .newInstance().asInstanceOf[MediaDecoder]
            catch {
              case _: ClassNotFoundException if configured.isEmpty => stub
            }
          cached = Some((key, d))
          d
      }
    }
  }

  /** The decode stage: batch-wise mapPartitions over typed records. The
    * per-batch call goes through the [[MediaDecoder]] seam — resolved on
    * the executor, so the driver never needs the codec classes.
    */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val decoder = MediaDecoder.resolve()
      it.grouped(DecodeBatchSize).flatMap { batch =>
        decoder.decodeBatch(batch).iterator
      }
    }
  }

  /** Frame sampling: every `step`-th frame index of each decoded media
    * record, as (doc_id, frame_idx, frame_md5) — the 1→N expansion a
    * vision feature-extractor consumes (sampled frames, not all frames,
    * bound the downstream GPU work at video scale). Pure map-side
    * (`sequence` + `explode`, no shuffle); the per-frame "content" hash is
    * STUBBED deterministically from (content_md5, frame_idx) — a real
    * pipeline would seek-decode the frame here, same plumbing.
    */
  def sampleFrames(decoded: DataFrame, step: Int): DataFrame = {
    require(step > 0)
    decoded.filter(col("fake_frames") > 0)
      .select(col("doc_id"), col("content_md5"),
        explode(sequence(lit(0L), col("fake_frames") - 1, lit(step.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("content_md5"), lit(":"), col("frame_idx").cast("string")))
          .as("frame_md5"))
  }

  /** Feature-extraction stage: decoded media → fixed-dim embedding
    * (`array<float>`), the column every similarity/ANN operator consumes.
    * STUBBED deterministically (dim hashes of the content hash, scaled to
    * [0,1) and rounded through float) so DuckDB can recompute it exactly;
    * a real model call would instead use the `decodeAll` batched
    * `mapPartitions` shape (amortize model init per batch). Expression-
    * based here so it stays inside whole-stage codegen — no shuffle, no
    * JVM object churn.
    */
  def embedStub(decoded: DataFrame, dim: Int): DataFrame = {
    require(dim > 0)
    // SamplingOps.md5Prefix60: the one shared cross-engine hash — same
    // definition the DuckDB oracle mirrors, so the stub embedding cannot
    // drift from it.
    decoded.select(col("doc_id"),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        (SamplingOps.md5Prefix60(
            concat(col("content_md5"), lit(":"), i.cast("string")))
          % 1000000L / 1000000.0).cast("float"))
        .as("embedding"))
  }

  /** Resize stage (stub): fit decoded dimensions into a `target`-pixel
    * box, preserving aspect ratio, never upscaling — pure integer
    * arithmetic (`div`) so the oracle reproduces it bit-for-bit. A real
    * pipeline would do this inside the decode batch; the *dimension
    * contract* is what downstream layout planning consumes.
    */
  def resizeStub(decoded: DataFrame, target: Int): DataFrame = {
    require(target > 0)
    decoded.select(col("doc_id"), col("fake_width"), col("fake_height"),
      expr(s"cast((fake_width * $target) div greatest(fake_width, fake_height, $target) as int)")
        .as("out_w"),
      expr(s"cast((fake_height * $target) div greatest(fake_width, fake_height, $target) as int)")
        .as("out_h"))
  }

  /** Lowercase-hex md5 of raw bytes — the ONE definition of the
    * oracle-compared `content_md5` column, shared by the stub and every
    * real decoder on the seam so the formats cannot drift.
    */
  def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map(b => f"$b%02x").mkString

  /** Deterministic fake decode: features derived only from the bytes. */
  def decodeStub(r: MediaRecord): DecodedMedia = {
    val hex = md5Hex(r.payload)
    DecodedMedia(
      doc_id = r.doc_id,
      n_bytes = r.n_bytes,
      format = r.format,
      fake_width = r.n_bytes % 64,
      fake_height = (r.n_bytes / 64) % 64,
      fake_frames = r.n_bytes.toLong / 256L,
      content_md5 = hex)
  }
}
