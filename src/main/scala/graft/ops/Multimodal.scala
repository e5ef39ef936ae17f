package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * processed in batched mapPartitions kernels.
  *
  * The actual media decode is a STUB (no image/audio codecs ship in this
  * container): `decodeImageMeta` derives deterministic pseudo-metadata from
  * the bytes, and `sampleFrames` takes deterministic byte slices standing in
  * for frame extraction. The Spark-side contract — binary column in, typed
  * struct out, per-partition batching, codec state instantiated once per
  * partition — is real; swapping the stub for a javax.imageio / ffmpeg call
  * changes only the kernel body.
  */
object Multimodal {

  /** Typed metadata the "decoder" emits. */
  final case class ImageMeta(
      content_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      format: String,
      content_hash: String
  )

  /** STUB decode: pseudo width/height/format from the byte length, md5 as
    * the content hash. Every field is a pure function of the payload BYTES
    * (not characters), so an ANSI SQL oracle recomputes it from the same
    * blob with no UTF-8 ambiguity.
    */
  def decodeImageMeta(id: Long, bytes: Array[Byte]): ImageMeta =
    decodeImageMeta(id, bytes, java.security.MessageDigest.getInstance("MD5"))

  def decodeImageMeta(id: Long, bytes: Array[Byte], md: java.security.MessageDigest): ImageMeta = {
    val n = if (bytes == null) 0 else bytes.length
    md.reset()
    val hash =
      if (bytes == null) "" else md.digest(bytes).map("%02x".format(_)).mkString
    ImageMeta(
      content_id = id,
      n_bytes = n,
      width = 1 + n % 640,
      height = 1 + n % 480,
      format = if (n == 0) "empty" else if (n % 2 == 0) "png" else "jpeg",
      content_hash = hash
    )
  }

  /** Batched metadata extraction over a (content_id, payload binary) frame.
    * One "codec" per partition (the MessageDigest instance is created in the
    * partition closure and reset per row — the mapPartitions-batched pattern
    * the extraction engine uses for parsers).
    */
  def imageMeta(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media
      .select(col("content_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec" instantiation point
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => decodeImageMeta(id, bytes, md) }
      }
      .toDF()
  }

  /** STUB frame sampling: every `stride`-th 16-byte slice of the payload,
    * standing in for video frame extraction; shows the explode-shaped output
    * (one row per frame) with deterministic frame ids.
    */
  def sampleFrames(media: DataFrame, stride: Int = 64)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media
      .select(col("content_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Iterator.empty
        else
          (0 until bytes.length by stride).iterator.zipWithIndex.map {
            case (off, frame) =>
              val slice = bytes.slice(off, math.min(bytes.length, off + 16))
              (id, frame, off, slice.map(b => (b & 0xff).toLong).sum)
          }
      }
      .toDF("content_id", "frame_idx", "byte_offset", "frame_checksum")
  }
}
