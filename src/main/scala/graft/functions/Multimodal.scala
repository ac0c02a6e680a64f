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
 * Multimodal decode plumbing over opaque `binary` payloads.
 *
 * The DECODE STEP IS A DETERMINISTIC STUB — this container has no image/
 * audio/video codecs, so "decoding" derives metadata from the payload
 * bytes' md5. Everything around the stub is the real 100-TB shape:
 *  - payloads stay opaque binary columns (never strings in flight);
 *  - decoding runs via `mapPartitions`, ONE decoder instance per
 *    partition (the pattern for heavyweight codec contexts — the Scala
 *    analog of a Pandas-UDF batch);
 *  - output is a typed Dataset with per-modality nullable fields.
 *
 * Swapping the stub for a real codec changes only [[decodeOne]].
 * The column-expression twin of this logic lives in the m1 query
 * (PipelineQueries) so the same semantics sit under the DuckDB gate;
 * MultimodalSpec asserts the two paths agree.
 */
object Multimodal {

  /** Stub decode of one payload (deterministic in the payload bytes). */
  def decodeOne(docId: Long, payload: Array[Byte],
      md: java.security.MessageDigest): MediaMeta = {
    val hex = md.digest(payload).map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val len = payload.length.toLong
    val modality = (docId % 3) match {
      case 0 => "image"
      case 1 => "audio"
      case _ => "video"
    }
    modality match {
      case "image" => MediaMeta(docId, modality, len, hex,
        Some((160 + (h % 8) * 160).toInt), Some((120 + ((h / 8) % 8) * 120).toInt),
        None, None, None)
      case "audio" => MediaMeta(docId, modality, len, hex,
        None, None, Some(len * 125), None, None)
      case _ => MediaMeta(docId, modality, len, hex,
        // ceil(len/64) — consistent with frameSampleBatch/m2's frame count
        None, None, None, Some((len + 63) / 64), Some((24 + (h % 2) * 6).toInt))
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

  /** One sampled "frame" — a fixed-size byte window of the payload
    * (the stub stand-in for a decoded video frame). */
  final case class Frame(
      doc_id: Long, frame_idx: Long, frame_len: Long, frame_md5: String)

  /** Frame sampling: split the payload into `frameBytes`-byte frames and
    * keep every `everyNth` one. Same batch shape as [[decodeBatch]]; the
    * column-expression twin is the m2 query entry. */
  def frameSampleBatch(everyNth: Int, frameBytes: Int)(
      rows: Iterator[(Long, Array[Byte])]): Iterator[Frame] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.flatMap { case (id, payload) =>
      val nFrames = (payload.length + frameBytes - 1) / frameBytes
      (0 until nFrames).iterator
        .filter(_ % everyNth == 0)
        .map { i =>
          val from = i * frameBytes
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
