package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2b): media as opaque
  * `binary` payloads + typed metadata, processed in per-partition
  * batches.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE decoder; everything around it —
  * schema, partition-batched execution, typed records — is the real
  * shape a codec UDF would plug into (swap `decodeStub`'s body for
  * JNI/codec calls per partition; batch amortizes codec init).
  */
object Multimodal {

  /** A media record: opaque payload + metadata the pipeline trusts. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte],
                         width: Int, height: Int, fmt: String)

  /** Features a decoder would emit per record, including the resize
    * stub's thumbnail outputs. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, checksum: Long,
                           width: Int, height: Int, n_pixels: Long,
                           thumb_w: Int, thumb_h: Int, thumb_checksum: Long,
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

  /** STUB decoder: deterministic fake "decode" (byte checksum) in
    * place of a real codec. Real implementation would decode
    * `payload` with an image/audio library here, once per partition
    * batch. */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    // ??? <- real codec goes here; deterministic fake below
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
    // resize stub: 4x downscale — real impl would interpolate pixels;
    // the fake samples every 4th byte so output depends on content
    var tsum = 0L
    var j = 0
    while (j < r.payload.length) { tsum += (r.payload(j) & 0xff); j += 4 }
    MediaFeatures(r.doc_id, r.payload.length, sum % 100000,
      r.width, r.height, r.width.toLong * r.height,
      r.width / 4, r.height / 4, tsum % 100000, r.fmt)
  }

  /** multimodal_meta query: batch-decode features over partitions. */
  def features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .mapPartitions(_.map(decodeStub))
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
