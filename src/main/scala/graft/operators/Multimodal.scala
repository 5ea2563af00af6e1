package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
