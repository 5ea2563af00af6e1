package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for the training-data pipeline: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, processed
  * in partition-sized batches.
  *
  * The actual codec decode is STUBBED (this container has no image/audio
  * libraries): `StubDecoder.decode` derives deterministic pseudo-metadata
  * from the bytes. Everything Spark-side — schema, binary column handling,
  * batched `mapPartitions` with per-partition decoder init (the same
  * amortization pattern as the OCR engine), partition sizing — is real and
  * tested. Swapping in a real decoder (JNI ffmpeg/libvips or a Python
  * `mapInArrow` stage) touches only the `Decoder` trait.
  */
object Multimodal {

  final case class MediaMeta(
      media_id: Long,
      byte_len: Long,
      format: String,        // sniffed from magic bytes
      width: Int,            // stub-derived
      height: Int,
      checksum: String)      // md5 hex of payload

  trait Decoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta
  }

  /** Deterministic fake decode: format from magic bytes, dims from a hash of
    * the payload. A real decoder replaces ONLY this class. */
  object StubDecoder extends Decoder {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val fmt =
        if (bytes.length >= 8 &&
          (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
        else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
        else "bin"
      var h = 1125899906842597L
      var i = 0
      while (i < math.min(bytes.length, 256)) { h = 31 * h + bytes(i); i += 1 }
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      MediaMeta(id, bytes.length.toLong, fmt,
        320 + (math.abs(h) % 1600).toInt, 240 + (math.abs(h >> 11) % 900).toInt,
        md.map("%02x".format(_)).mkString)
    }
  }

  /** Sampled "frames" of a payload column: frame i is the `frameChars`-wide
    * window starting at offset i·frameChars, and every k-th frame is kept —
    * the frame-sampling plumbing of a video pipeline (pick every k-th frame,
    * fingerprint it, dedup/cluster downstream). Pure per-row generate +
    * window slice + md5: no shuffle, no decoder. In production the window
    * is a BYTE range into the media payload behind the `Decoder` seam; the
    * sandbox payload is the documents' text (DuckDB has no BLOB substring,
    * so character windows keep the oracle value-exact).
    * Rows with an empty payload produce no frames (Spark's `sequence`
    * would reject the descending bounds, so they are filtered first; any
    * SQL oracle must filter them too — integer division by truncation
    * makes `(-1)/F = 0`, which would emit a spurious frame 0). */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
      frameChars: Int = 256, everyK: Int = 3): DataFrame = {
    val maxIdx = floor((length(col(payloadCol)) - 1) / frameChars).cast("long")
    df.filter(length(col(payloadCol)) > 0)
      .select(col(idCol),
        explode(sequence(lit(0L), maxIdx, lit(everyK.toLong))).as("frame_idx"),
        col(payloadCol))
      .select(col(idCol), col("frame_idx"),
        md5(col(payloadCol)
          .substr((col("frame_idx") * frameChars + 1).cast("int"), lit(frameChars))
          .cast("binary")).as("frame_md5"))
  }

  /** Resize planning with pure integer-safe math: fit (w, h) into a
    * box×box square preserving aspect ratio. Returns (new_w, new_h).
    * The pixel resample itself is decoder territory (the honest stub
    * boundary); this is the metadata/partitioning side a batch image
    * pipeline plans with. floor-of-double is exact here (values ≪ 2^53)
    * and evaluates identically in DuckDB. */
  def fitBox(w: Column, h: Column, box: Int): (Column, Column) = (
    when(w >= h, lit(box.toLong)).otherwise(floor(w * box / h).cast("long")),
    when(w >= h, floor(h * box / w).cast("long")).otherwise(lit(box.toLong)))

  /** Batched decode over a (id: Long, payload: binary) DataFrame. Decoder
    * constructed once per partition. */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String,
      mkDecoder: () => Decoder = () => StubDecoder): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = mkDecoder() // per-partition init, amortized
        it.map { case (id, bytes) => dec.decode(id, if (bytes == null) Array.emptyByteArray else bytes) }
      }
  }
}
