package graft.media

import java.io.ByteArrayInputStream

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.{DecodedMedia, MediaDecoder, MediaRecord}

/** A REAL image decoder on the [[MediaDecoder]] seam, built entirely on
  * `javax.imageio` (java.desktop module — pure JVM, no native codecs), so
  * CI exercises an actual decode → dimensions path and not only the
  * deterministic stub. Resolve it per deployment with
  * `-Dgraft.media.decoder.class=graft.media.ImageIoMediaDecoder`; the
  * unconfigured default remains the stub, which stays the oracle/CI truth
  * for the registered mm_* queries (an oracle cannot re-run a codec).
  *
  * Contract choices:
  *  - raster formats javax.imageio ships readers for (PNG/BMP/GIF/JPEG/
  *    WBMP) are decoded for real: width/height from the codec, one frame,
  *    content hash of the exact payload bytes;
  *  - any other `format` tag (e.g. the `utf8-text` ingest shape) delegates
  *    to [[MultimodalOps.decodeStub]] — a text payload has no raster
  *    dimensions, and mixed-modality batches are the normal input shape;
  *  - an image-tagged payload the codec cannot parse FAILS LOUDLY
  *    (corrupt data must never silently flow on as stub features).
  */
class ImageIoMediaDecoder extends MediaDecoder {

  private val imageFormats = Set("png", "bmp", "gif", "jpeg", "jpg", "wbmp")

  override def decodeBatch(batch: Seq[MediaRecord]): Seq[DecodedMedia] =
    batch.map { r =>
      if (imageFormats.contains(r.format.toLowerCase(java.util.Locale.ROOT))) {
        // MemoryCacheImageInputStream, not ImageIO.read(InputStream): the
        // latter defaults to a DISK-cached stream wrapper — one temp-file
        // create/write/delete per image on the executor hot path (and a
        // hard failure on a read-only tmpdir) for a payload that is
        // already fully in memory.
        // ImageIO.read(ImageInputStream) closes the stream itself — no
        // explicit close here (a second close throws "closed").
        val img = javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new ByteArrayInputStream(r.payload)))
        if (img == null)
          throw new IllegalArgumentException(
            s"ImageIoMediaDecoder: undecodable '${r.format}' payload (doc ${r.doc_id}, ${r.n_bytes} bytes)")
        val hex = MultimodalOps.md5Hex(r.payload)
        DecodedMedia(
          doc_id = r.doc_id,
          n_bytes = r.n_bytes,
          format = r.format,
          fake_width = img.getWidth,
          fake_height = img.getHeight,
          fake_frames = 1L,
          content_md5 = hex)
      } else MultimodalOps.decodeStub(r)
    }
}
