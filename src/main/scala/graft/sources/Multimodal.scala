package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2b): media as opaque
  * `binary` payloads + typed metadata, processed in per-partition
  * batches.
  *
  * The image path is a REAL decode: each payload is rendered as an
  * uncompressed 24-bit BMP (deterministic bytes, synthesized
  * in-query) and decoded through `javax.imageio` — the codec the JDK
  * ships — with the decoded dimensions and pixel statistics emitted
  * as features; the oracle recomputes them from the same bytes (BMP
  * is uncompressed, so the pixel plane is SQL-expressible). The
  * video frame sampler remains a clearly-marked deterministic stub
  * (no video codec in the JDK): its fan-out shape — bounded flatMap,
  * one row per frame — is the part that matters at scale.
  */
object Multimodal {

  /** A media record: opaque payload + metadata the pipeline trusts. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte],
                         width: Int, height: Int, fmt: String)

  /** Features the decoder emits per record: raw-byte stats, the
    * resize stub's thumbnail outputs, and the ImageIO-decoded
    * dimensions + pixel sum (img_w/img_h/pixel_sum come from the
    * DECODED BufferedImage, not the metadata — a decode that silently
    * produced the wrong plane would hash-mismatch). */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, checksum: Long,
                           width: Int, height: Int, n_pixels: Long,
                           thumb_w: Int, thumb_h: Int, thumb_checksum: Long,
                           img_w: Int, img_h: Int, pixel_sum: Long,
                           fmt: String)

  /** Manufacture a binary "media" column from the documents table —
    * payload = UTF-8 bytes of the text (stands in for image bytes),
    * dimensions derived deterministically from doc_id. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        ((col("doc_id") % 64 + 16) * 8).cast("int").as("width"),
        ((col("doc_id") % 48 + 12) * 8).cast("int").as("height"),
        lit("fake/raw").as("fmt"))
      .as[MediaRecord]
  }

  /** Deterministic 24-bit bottom-up BMP whose decoded pixel (x, y)
    * (top-left origin) is the grayscale value payload[(y*w + x) mod
    * len] — a synthetic but REAL image file, byte-derived so the
    * oracle can recompute the pixel plane in SQL. */
  private[graft] def bmpBytes(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val imageSize = rowBytes * h
    val buf = java.nio.ByteBuffer.allocate(54 + imageSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + imageSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(imageSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    val len = payload.length
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow // bottom-up storage
      var x = 0
      while (x < w) {
        val v = payload((y * w + x) % len)
        buf.put(v).put(v).put(v)
        x += 1
      }
      var p = w * 3
      while (p < rowBytes) { buf.put(0.toByte); p += 1 }
      fileRow += 1
    }
    buf.array()
  }

  /** Decoded image dimensions — small (≤19×15) so 100k-record
    * partitions stay cheap; derived from doc_id like the claimed
    * metadata dims. */
  private def imgDims(docId: Long): (Int, Int) =
    ((docId % 16 + 4).toInt, (docId % 12 + 4).toInt)

  /** REAL decode: synthesize the BMP from the payload, decode it with
    * the JDK's ImageIO BMP codec, and read features off the decoded
    * BufferedImage. Runs once per record inside a partition batch —
    * the codec plugin is process-wide, so per-partition amortization
    * is the registry lookup, not an init cost. */
  private def decode(r: MediaRecord): MediaFeatures = {
    // empty payloads are rejected LOUDLY: the pixel plane (and the
    // oracle's modular arithmetic over it) is undefined on zero bytes,
    // and a silent zeroed row would diverge from the oracle anyway —
    // invalid media must fail the pipeline, not pass as features
    require(r.payload.nonEmpty, s"doc ${r.doc_id}: empty media payload")
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
    // resize stub: 4x downscale — real impl would interpolate pixels;
    // the fake samples every 4th byte so output depends on content
    var tsum = 0L
    var j = 0
    while (j < r.payload.length) { tsum += (r.payload(j) & 0xff); j += 4 }
    val (w, h) = imgDims(r.doc_id)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bmpBytes(r.payload, w, h)))
    require(img != null, s"doc ${r.doc_id}: ImageIO found no BMP reader")
    var psum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { psum += img.getRGB(x, y) & 0xff; x += 1 }
      y += 1
    }
    MediaFeatures(r.doc_id, r.payload.length, sum % 100000,
      r.width, r.height, r.width.toLong * r.height,
      r.width / 4, r.height / 4, tsum % 100000,
      img.getWidth, img.getHeight, psum % 100000, r.fmt)
  }

  /** multimodal_meta query: batch-decode features over partitions. */
  def features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .mapPartitions(_.map(decode))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** A sampled "frame" of a media payload (video frame-sample stub:
    * fixed-stride byte slices stand in for decoded frames). */
  case class Frame(doc_id: Long, frame_idx: Int, offset: Int,
                   frame_len: Int, frame_checksum: Long)

  /** STUB frame sampler: emits up to `maxFrames` fixed-stride slices
    * per payload — the real implementation would seek keyframes with
    * a codec; the fan-out shape (flatMap, one row per frame, bounded
    * per input row) is what survives at scale. */
  def frameSample(s: SparkSession, d: String,
                  frameLen: Int = 32, maxFrames: Int = 4): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .flatMap { r =>
        // ??? <- real keyframe decode goes here; deterministic fake below
        val n = math.min(maxFrames, math.max(1, r.payload.length / frameLen))
        (0 until n).iterator.map { i =>
          val off = i * frameLen
          val len = math.min(frameLen, r.payload.length - off)
          var sum = 0L
          var j = off
          while (j < off + len) { sum += (r.payload(j) & 0xff); j += 1 }
          Frame(r.doc_id, i, off, len, sum)
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }
}
