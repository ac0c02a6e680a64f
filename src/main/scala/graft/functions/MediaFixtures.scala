package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/**
 * Multimodal FIXTURE generator: wraps each document's text bytes in a
 * VALID container header so the decode path has real bytes to parse —
 * PNG (IHDR chunk, spec-true CRC32) for images, WAV (RIFF/fmt/data
 * chunks) for audio, AVI (RIFF/hdrl/avih) for video. The embedded
 * metadata values are deterministic in md5(text), which is what lets
 * the DuckDB oracle recompute the expected values independently: the
 * hash gate then proves the construct→parse round-trip is faithful,
 * and golden-byte tests in MultimodalSpec prove the parser is
 * spec-true against literal headers it did not construct.
 *
 * This object is FIXTURE plumbing (the sandbox has no media files);
 * [[Multimodal]] is the production-shaped decoder. Layouts are the
 * canonical minimal ones, so header sizes are fixed per modality
 * ([[PngHeaderLen]]/[[WavHeaderLen]]/[[AviHeaderLen]]) — the column-
 * expression decoder in the m1–m3 queries relies on those offsets,
 * while [[Multimodal.decodeOne]] walks chunks/markers generally.
 *
 * Reference behavior modeled: uReplicator moves opaque Kafka payloads;
 * a training-data engine additionally must crack open media payloads
 * (see SURVEY.md §2.3 multimodal).
 */
object MediaFixtures {

  val PngHeaderLen = 33 // 8 sig + 4 len + 4 "IHDR" + 13 data + 4 crc
  val WavHeaderLen = 44 // canonical RIFF/WAVE + fmt(16) + data chunk hdr
  val AviHeaderLen = 88 // RIFF/AVI + LIST hdrl + avih(56)

  val WavSampleRate = 8000
  val WavByteRate = 16000 // mono, 16-bit: sampleRate * 2

  /** Same value as the `md5Long` column expression / DuckDB
    * `('0x'||substr(md5(text),1,15))::BIGINT`. */
  def md5Long15(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def modalityOf(docId: Long): String = (docId % 3) match {
    case 0 => "image"
    case 1 => "audio"
    case _ => "video"
  }

  def imageDims(h: Long): (Int, Int) =
    ((160 + (h % 8) * 160).toInt, (120 + ((h / 8) % 8) * 120).toInt)

  def videoFps(h: Long): Int = (24 + (h % 2) * 6).toInt

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
    ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Valid PNG: signature + IHDR (width/height u32be, 8-bit RGB) with a
    * real CRC32, body appended as opaque trailing bytes. */
  def pngPayload(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdrData = be32(width.toLong) ++ be32(height.toLong) ++
      Array[Byte](8, 2, 0, 0, 0)
    val crc = new java.util.zip.CRC32
    crc.update(ascii("IHDR")); crc.update(ihdrData)
    sig ++ be32(13) ++ ascii("IHDR") ++ ihdrData ++ be32(crc.getValue) ++ body
  }

  /** Valid WAV: RIFF/WAVE + 16-byte fmt chunk (PCM mono 16-bit 8 kHz) +
    * data chunk sized to the body. duration_ms = dataSize·1000/byteRate. */
  def wavPayload(body: Array[Byte]): Array[Byte] = {
    val dataSize = body.length.toLong
    ascii("RIFF") ++ le32(36 + dataSize) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(WavSampleRate.toLong) ++ le32(WavByteRate.toLong) ++
      le16(2) ++ le16(16) ++
      ascii("data") ++ le32(dataSize) ++ body
  }

  /** Valid AVI prefix: RIFF/"AVI " + LIST hdrl containing one avih main
    * header (dwMicroSecPerFrame, dwTotalFrames), body appended. */
  def aviPayload(fps: Int, nFrames: Long, body: Array[Byte]): Array[Byte] = {
    val usPerFrame = 1000000L / fps
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(0) ++ le32(0) ++ Array.fill[Byte](16)(0)
    require(avih.length == 56)
    ascii("RIFF") ++ le32(80 + body.length.toLong) ++ ascii("AVI ") ++
      ascii("LIST") ++ le32(68) ++ ascii("hdrl") ++
      ascii("avih") ++ le32(56) ++ avih ++ body
  }

  /** The fixture payload for one document: a valid header whose embedded
    * metadata is deterministic in md5(text), followed by the text bytes
    * (the "stream" that m2 frames). */
  def payloadFor(docId: Long, text: Array[Byte]): Array[Byte] = {
    val h = md5Long15(text)
    modalityOf(docId) match {
      case "image" =>
        val (w, ht) = imageDims(h)
        pngPayload(w, ht, text)
      case "audio" => wavPayload(text)
      case _ =>
        aviPayload(videoFps(h), (text.length.toLong + 63) / 64, text)
    }
  }

  /** (doc_id, text) → (doc_id, text, payload) with a valid container
    * header. Runs as a typed map (fixture-side; at real scale payloads
    * arrive already-encoded from the lake, this step doesn't exist). */
  def withPayload(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        // null text → empty body (the old cast-to-binary path passed
        // nulls through; an NPE per corrupt row is worse than an
        // empty-payload container)
        val body = Option(text).getOrElse("").getBytes("UTF-8")
        (id, text, payloadFor(id, body))
      }
      .toDF("doc_id", "text", "payload")
  }
}
