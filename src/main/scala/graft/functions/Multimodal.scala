package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}

/** Extracted metadata for one opaque media payload. Per-modality fields
  * are None for the other modalities. */
final case class MediaMeta(
    doc_id: Long,
    modality: String,
    byte_len: Long,
    payload_md5: String,
    width: Option[Int],        // image
    height: Option[Int],       // image
    duration_ms: Option[Long], // audio
    n_frames: Option[Long],    // video
    fps: Option[Int])          // video

/**
 * Multimodal decode over opaque `binary` payloads — REAL byte-level
 * container parsing, no codec dependencies:
 *  - PNG: signature sniff + IHDR chunk walk → width/height (u32be);
 *  - JPEG: marker walk to SOF0/1/2 → width/height (u16be);
 *  - WAV: RIFF chunk walk to `fmt `/`data` → duration from
 *    dataSize·1000/byteRate;
 *  - AVI: RIFF/LIST walk to `avih` → fps (1e6/dwMicroSecPerFrame) and
 *    dwTotalFrames.
 * Pixel/sample decoding (the part that genuinely needs a codec) is out
 * of scope; header metadata is parsed from the actual bytes.
 *
 * Execution shape (the 100-TB part):
 *  - payloads stay opaque binary columns (never strings in flight);
 *  - decoding runs via `mapPartitions`, ONE decoder instance per
 *    partition (the pattern for heavyweight codec contexts — the Scala
 *    analog of a Pandas-UDF batch);
 *  - output is a typed Dataset with per-modality nullable fields.
 *
 * The column-expression twin of this logic lives in the m1 query
 * (PipelineQueries) so the same semantics sit under the DuckDB gate
 * (fixed offsets there — the fixture layout is canonical; this parser
 * walks chunks/markers generally); MultimodalSpec asserts the two paths
 * agree and pins spec conformance with golden literal headers.
 */
object Multimodal {

  private def beU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def beU16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    if (off + 4 <= b.length)
      new String(b, off, 4, "US-ASCII")
    else ""

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => b(i) == PngSig(i))

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE"

  def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "AVI "

  // All walkers advance by size fields read from the payload. A
  // malformed size (e.g. 0xFFFFFFF4 wrapping to <= 0 via .toInt) must
  // abort the walk with None, never spin or index out of bounds — one
  // corrupt record must not wedge a decode job.
  private def advance(off: Int, step: Long): Int = {
    // -1 ends every walk loop (each checks off >= 0 first); anything
    // near Int.MaxValue would overflow the `off + k <= length` guards
    if (step <= 0 || off.toLong + step > Int.MaxValue - 16) -1
    else off + step.toInt
  }

  /** PNG IHDR walk: (width, height). IHDR is required to be the first
    * chunk, but walk anyway so non-canonical files still parse. */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] = {
    var off = 8
    while (off >= 0 && off + 8 <= b.length) {
      val len = beU32(b, off)
      if (tag(b, off + 4) == "IHDR" && off + 16 <= b.length)
        return Some((beU32(b, off + 8).toInt, beU32(b, off + 12).toInt))
      off = advance(off, 8 + len + 4) // len + type + data + crc
    }
    None
  }

  /** JPEG marker walk to the first SOF0/1/2 frame header: (width, height).
    * Standalone markers (D0–D9, 01) carry no length field. */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var off = 2
    while (off >= 0 && off + 4 <= b.length && (b(off) & 0xff) == 0xff) {
      val marker = b(off + 1) & 0xff
      if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
        if (off + 9 <= b.length)
          return Some((beU16(b, off + 7), beU16(b, off + 5)))
        return None
      }
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) off += 2
      else off = advance(off, 2L + beU16(b, off + 2)) // len 0/1 is malformed
    }
    None
  }

  /** WAV RIFF chunk walk: duration_ms = dataSize·1000/byteRate. */
  def wavDurationMs(b: Array[Byte]): Option[Long] = {
    var off = 12
    var byteRate = 0L
    var dataSize = -1L
    while (off >= 0 && off + 8 <= b.length) {
      val id = tag(b, off)
      val size = leU32(b, off + 4)
      if (id == "fmt " && off + 20 <= b.length) byteRate = leU32(b, off + 16)
      else if (id == "data") dataSize = size
      off = advance(off, 8 + size + (size % 2)) // RIFF pads chunks to even
    }
    if (byteRate > 0 && dataSize >= 0) Some(dataSize * 1000 / byteRate) else None
  }

  /** AVI LIST/hdrl walk to `avih`: (fps, totalFrames). */
  def aviInfo(b: Array[Byte]): Option[(Int, Long)] = {
    var off = 12
    while (off >= 0 && off + 12 <= b.length) {
      val id = tag(b, off)
      val size = leU32(b, off + 4)
      if (id == "LIST" && tag(b, off + 8) == "hdrl") {
        var sub = off + 12
        val end = math.min(b.length.toLong, off + 8 + size).toInt
        while (sub >= 0 && sub + 8 <= end) {
          val subSize = leU32(b, sub + 4)
          if (tag(b, sub) == "avih" && sub + 28 <= b.length) {
            val usPerFrame = leU32(b, sub + 8)
            if (usPerFrame > 0)
              return Some(((1000000L / usPerFrame).toInt, leU32(b, sub + 24)))
            return None
          }
          sub = advance(sub, 8 + subSize + (subSize % 2))
        }
      }
      off = advance(off, 8 + size + (size % 2))
    }
    None
  }

  /** Decode one payload by sniffing the container magic and parsing the
    * real header bytes. Unrecognized payloads → modality "unknown". */
  def decodeOne(docId: Long, payload: Array[Byte],
      md: java.security.MessageDigest): MediaMeta = {
    val hex = md.digest(payload).map(b => f"$b%02x").mkString
    val len = payload.length.toLong
    if (isPng(payload) || isJpeg(payload)) {
      val dims = if (isPng(payload)) pngDims(payload) else jpegDims(payload)
      MediaMeta(docId, "image", len, hex,
        dims.map(_._1), dims.map(_._2), None, None, None)
    } else if (isWav(payload)) {
      MediaMeta(docId, "audio", len, hex,
        None, None, wavDurationMs(payload), None, None)
    } else if (isAvi(payload)) {
      val info = aviInfo(payload)
      MediaMeta(docId, "video", len, hex,
        None, None, None, info.map(_._2), info.map(_._1))
    } else {
      MediaMeta(docId, "unknown", len, hex, None, None, None, None, None)
    }
  }

  /** Batch decode: one MessageDigest (stand-in for a codec context) per
    * partition, streamed over the rows. */
  def decodeBatch(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaMeta] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { case (id, payload) => decodeOne(id, payload, md) }
  }

  /** df must have (doc_id: long, payload: binary). */
  def decode(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("cast(doc_id as long) as doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(decodeBatch)
  }

  /** Byte offset where the container's stream/body starts, parsed from
    * the header (PNG: after the IHDR chunk; WAV: after the data chunk
    * header; AVI: after the hdrl LIST). -1 if unrecognized. */
  def bodyOffset(b: Array[Byte]): Int = {
    if (isPng(b) && b.length >= 16)
      8 + 8 + beU32(b, 8).toInt + 4 // sig + chunk hdr + IHDR data + crc
    else if (isWav(b)) {
      var off = 12
      while (off >= 0 && off + 8 <= b.length) {
        if (tag(b, off) == "data") return off + 8
        val size = leU32(b, off + 4)
        off = advance(off, 8 + size + (size % 2))
      }
      -1
    } else if (isAvi(b) && b.length >= 20)
      12 + 8 + leU32(b, 16).toInt // RIFF hdr + LIST hdr + LIST size
    else -1
  }

  /** One sampled "frame" — a fixed-size byte window of the payload's
    * BODY (the stream after the parsed container header; real frame
    * decode would need a codec — the windowing/sampling shape is what
    * a cluster runs). */
  final case class Frame(
      doc_id: Long, frame_idx: Long, frame_len: Long, frame_md5: String)

  /** Frame sampling: locate the body via [[bodyOffset]], split it into
    * `frameBytes`-byte frames and keep every `everyNth` one. Same batch
    * shape as [[decodeBatch]]; the column-expression twin is the m2
    * query entry. Payloads with no recognized container are framed from
    * byte 0 (raw streams). */
  def frameSampleBatch(everyNth: Int, frameBytes: Int)(
      rows: Iterator[(Long, Array[Byte])]): Iterator[Frame] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.flatMap { case (id, payload) =>
      val start = math.max(0, bodyOffset(payload))
      val bodyLen = payload.length - start
      val nFrames = (bodyLen + frameBytes - 1) / frameBytes
      (0 until nFrames).iterator
        .filter(_ % everyNth == 0)
        .map { i =>
          val from = start + i * frameBytes
          val frame = java.util.Arrays.copyOfRange(
            payload, from, math.min(from + frameBytes, payload.length))
          Frame(id, i.toLong, frame.length.toLong,
            md.digest(frame).map(b => f"$b%02x").mkString)
        }
    }
  }

  def frameSample(df: DataFrame, everyNth: Int = 3,
      frameBytes: Int = 64): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("cast(doc_id as long) as doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(frameSampleBatch(everyNth, frameBytes))
  }
}
