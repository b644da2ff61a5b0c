package graft.ops

import graft.util.Det
import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata.
  *
  * The Spark-side shape is real and tested — schema, per-partition
  * batching, lazy decoder init (the S8 analog: per-process initializer,
  * compilation_parser.py:160-234). The codec itself is STUBBED: this
  * container has no image/audio libraries, so `decode` parses real PNG
  * headers (pure byte inspection) and otherwise produces a
  * deterministic fake — clearly marked below. Swap `StubCodec` for a
  * real decoder (e.g. a JNI codec initialized once per executor via the
  * same mapPartitions pattern) in production.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(
      media_id: Long, kind: String, format: String,
      width: Int, height: Int, n_bytes: Long, feature: Array[Float])

  /** Format sniffing from magic bytes — real logic, no stub. */
  def sniffFormat(payload: Array[Byte]): String = {
    def at(i: Int, v: Int) = payload.length > i && (payload(i) & 0xFF) == v
    if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) "png"
    else if (at(0, 0xFF) && at(1, 0xD8)) "jpeg"
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8') &&
      (at(4, '7') || at(4, '9')) && at(5, 'a')) "gif"
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F')) "riff"
    else if (at(4, 'f') && at(5, 't') && at(6, 'y') && at(7, 'p')) "mp4"
    else "unknown"
  }

  /** Big-endian int from 4 bytes. */
  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Real JPEG dimension parse: walk the marker segments from SOI to the
    * first SOF (C0–CF except C4/C8/CC); height/width are big-endian at
    * +5/+7 of the SOF segment. Pure byte inspection, no libraries. */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 3 < b.length && (b(i) & 0xFF) == 0xFF) {
      val marker = b(i + 1) & 0xFF
      if (marker == 0xFF) { i += 1 } // fill byte
      else if (marker >= 0xC0 && marker <= 0xCF &&
        marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
        return if (i + 8 < b.length) Some((be16(b, i + 7), be16(b, i + 5)))
        else None // (width, height)
      } else i += 2 + be16(b, i + 2) // loop guard re-checks bounds
    }
    None
  }

  /** A "decoder" handle that is expensive to construct — initialized
    * once per partition, not per row (mapPartitions closure). */
  final class StubCodec {
    /** PNG IHDR, GIF logical-screen, and JPEG SOF width/height are REAL
      * byte-level parses; everything else (riff/mp4 media, pixel decode)
      * is a ??? -grade STUB: deterministic fake dims from the payload
      * hash. */
    def decodeDims(payload: Array[Byte]): (Int, Int) =
      sniffFormat(payload) match {
        case "png" if payload.length >= 24 =>
          (be32(payload, 16), be32(payload, 20))
        case "gif" if payload.length >= 10 =>
          (le16(payload, 6), le16(payload, 8))
        case "jpeg" =>
          jpegDims(payload).getOrElse(fakeDims(payload))
        case _ => fakeDims(payload)
      }

    private def fakeDims(payload: Array[Byte]): (Int, Int) = {
      val h = Det.h(payload.length.toLong,
        if (payload.nonEmpty) payload(0).toLong else 0L)
      (64 + Det.nonNeg(h, 1024), 64 + Det.nonNeg(Det.mix64(h), 1024))
    }

    /** STUB feature extractor: seeded hash → 8-dim pseudo-embedding
      * (stands in for a real vision/audio model; deterministic so the
      * pipeline around it is testable). */
    def extractFeature(payload: Array[Byte]): Array[Float] = {
      val base = Det.h(payload.take(32).map(_.toLong): _*)
      Array.tabulate(8)(i => (Det.unit(Det.h(base, i.toLong)) * 2 - 1).toFloat)
    }
  }

  /** Decode + feature-extract over the binary column. Deliberately
    * mapPartitions: one codec per partition (per-executor-task init),
    * rows streamed through it — the batch shape a real codec needs. */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val codec = new StubCodec // lazy per-partition init (S8 analog)
      rows.map { r =>
        val (w, h) = codec.decodeDims(r.payload)
        MediaMeta(r.media_id, r.kind, sniffFormat(r.payload), w, h,
          r.payload.length.toLong, codec.extractFeature(r.payload))
      }
    }
  }

  /** Deterministic frame-sampling plan for a video payload: every
    * `stride`-th frame offset of `nFrames` — pure plumbing (a real
    * implementation would seek the container at these offsets). */
  def frameSamplePlan(nFrames: Int, stride: Int): Seq[Int] =
    0 until nFrames by math.max(1, stride)

  /** Binary-file directory source (≙ source-tree scan S5,
    * compilation_manager.py:44-54): one MediaRow per file, media_id =
    * stable hash of the path, kind from the extension. */
  def loadBinaryDir(spark: SparkSession, path: String): Dataset[MediaRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.read.format("binaryFile").load(path)
      .select(
        xxhash64(col("path")).as("media_id"),
        when(lower(col("path")).rlike("\\.(png|jpe?g|gif|webp)$"), "image")
          .when(lower(col("path")).rlike("\\.(wav|mp3|flac|ogg)$"), "audio")
          .when(lower(col("path")).rlike("\\.(mp4|mkv|webm|avi)$"), "video")
          .otherwise("unknown").as("kind"),
        col("content").as("payload"))
      .as[MediaRow]
  }
}
