package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * processed in batched mapPartitions kernels.
  *
  * Still-image metadata is REAL container-header parsing over the raw
  * bytes — PNG IHDR, JPEG SOFn marker scan, GIF logical screen
  * descriptor, BMP info header — pure byte-level work with no codec
  * dependency (reference analogue: diagnostics.py:278-376 derives image
  * stats from rendered pixmaps; here only the header fields a filter
  * pipeline routes on are decoded). Video/audio frame decode remains the
  * environment boundary (no ffmpeg-class codec ships in this container):
  * `sampleFrames` keeps the explode-shaped plumbing with deterministic
  * byte slices standing in for frames.
  */
object Multimodal {

  /** Typed metadata the decoder emits. */
  final case class ImageMeta(
      content_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      format: String,
      content_hash: String
  )

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def beU16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def leI32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)

  /** Container format + pixel dimensions from the header bytes alone.
    * A recognized magic whose header is truncated/malformed keeps the
    * format name with 0x0 dims (the row is routable, the decode failed);
    * no recognized magic at all is ("unknown", 0, 0).
    */
  def parseDims(b: Array[Byte]): (String, Int, Int) = {
    if (b == null || b.length == 0) return ("empty", 0, 0)

    // PNG: 8-byte signature, then the IHDR chunk MUST be first
    // (length=13, type "IHDR", width/height big-endian u32 at 16/20)
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
      (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a) {
      if (b.length >= 24 && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = beU32(b, 16); val h = beU32(b, 20)
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          return ("png", w.toInt, h.toInt)
      }
      return ("png", 0, 0)
    }

    // JPEG: SOI then a marker-segment walk to the first frame header
    // (SOFn, n != 4/8/12 which are DHT/JPG/DAC): height/width big-endian
    // u16 at +3/+5 inside the segment payload
    if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return ("jpeg", 0, 0) // lost sync
        var j = i
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= b.length) return ("jpeg", 0, 0)
        val marker = b(j) & 0xff
        if (marker == 0xd9 || marker == 0xda) return ("jpeg", 0, 0) // EOI/SOS: no frame header seen
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i = j + 1 // standalone
        else {
          if (j + 2 >= b.length) return ("jpeg", 0, 0)
          val segLen = beU16(b, j + 1)
          if (segLen < 2) return ("jpeg", 0, 0)
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (j + 7 >= b.length) return ("jpeg", 0, 0)
            val h = beU16(b, j + 4); val w = beU16(b, j + 6)
            return if (w > 0 && h > 0) ("jpeg", w, h) else ("jpeg", 0, 0)
          }
          i = j + 1 + segLen
        }
      }
      return ("jpeg", 0, 0)
    }

    // GIF: "GIF87a"/"GIF89a", logical screen w/h little-endian u16 at 6/8
    if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      if (b.length >= 10) {
        val w = leU16(b, 6); val h = leU16(b, 8)
        if (w > 0 && h > 0) return ("gif", w, h)
      }
      return ("gif", 0, 0)
    }

    // BMP: "BM", BITMAPINFOHEADER (size >= 40) at offset 14: width
    // little-endian i32 at 18, height at 22 (negative = top-down rows)
    if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
      if (b.length >= 26 && leI32(b, 14) >= 40) {
        val w = leI32(b, 18); val h = math.abs(leI32(b, 22))
        if (w > 0 && h > 0) return ("bmp", w, h)
      }
      return ("bmp", 0, 0)
    }

    ("unknown", 0, 0)
  }

  def decodeImageMeta(id: Long, bytes: Array[Byte]): ImageMeta =
    decodeImageMeta(id, bytes, java.security.MessageDigest.getInstance("MD5"))

  def decodeImageMeta(id: Long, bytes: Array[Byte], md: java.security.MessageDigest): ImageMeta = {
    val n = if (bytes == null) 0 else bytes.length
    md.reset()
    val hash =
      if (bytes == null) "" else graft.util.Hashing.hexLower(md.digest(bytes))
    val (fmt, w, h) = parseDims(bytes)
    ImageMeta(
      content_id = id,
      n_bytes = n,
      width = w,
      height = h,
      format = fmt,
      content_hash = hash
    )
  }

  /** Batched metadata extraction over a (content_id, payload binary) frame.
    * One hash instance per partition (created in the partition closure and
    * reset per row — the mapPartitions-batched pattern the extraction
    * engine uses for parsers); the header parse itself is allocation-free.
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
    * standing in for video frame extraction (the genuinely-external codec
    * boundary); shows the explode-shaped output (one row per frame) with
    * deterministic frame ids.
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
