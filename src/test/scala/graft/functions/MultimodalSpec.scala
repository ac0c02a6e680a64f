package graft.functions

import graft.SparkTestSession
import graft.queries.Catalog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal decode: the chunk-walking typed mapPartitions path must
  * agree with the column-expression twin under the DuckDB gate, and the
  * parser must be SPEC-TRUE against golden literal headers it did not
  * construct (the fixture round-trip alone can't catch a mirrored
  * offset bug in generator+parser). */
class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixturePayloads = {
    val dir = SparkTestSession.sfDir
    MediaFixtures.withPayload(
      spark.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id"), col("payload"))
  }

  // ------------------------------------------------- golden headers

  test("PNG parser is spec-true on the canonical 1x1 transparent PNG header") {
    // the well-known 1x1 RGBA PNG: signature + IHDR(w=1,h=1,depth=8,
    // color=6), CRC 1F15C489 — bytes from the PNG spec, not our generator
    val golden = Array(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
      0x08, 0x06, 0x00, 0x00, 0x00, 0x1f, 0x15, 0xc4, 0x89).map(_.toByte)
    assert(Multimodal.isPng(golden))
    assert(Multimodal.pngDims(golden).contains((1, 1)))
  }

  test("JPEG parser reads SOF0 dims through preceding marker segments") {
    // SOI + APP0(JFIF, 16 bytes) + SOF0(precision 8, height 0x00F0=240,
    // width 0x0140=320, 3 components) — laid out per ITU T.81
    val golden = Array(
      0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 0x4a, 0x46, 0x49, 0x46, 0x00,
      0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 0xf0, 0x01, 0x40,
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01).map(_.toByte)
    assert(Multimodal.isJpeg(golden))
    assert(Multimodal.jpegDims(golden).contains((320, 240)))
  }

  test("WAV parser: 1 s of 8 kHz mono 16-bit PCM is 1000 ms") {
    // canonical 44-byte header, dataSize = byteRate → exactly one second
    val golden = MediaFixtures.wavPayload(new Array[Byte](16000))
    assert(Multimodal.isWav(golden))
    assert(Multimodal.wavDurationMs(golden).contains(1000L))
    // and the chunk walker survives a non-canonical extra chunk: splice
    // a "LIST" chunk between fmt and data
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = golden.slice(0, 36) ++ extra ++ golden.drop(36)
    assert(Multimodal.wavDurationMs(spliced).contains(1000L))
  }

  test("AVI parser reads fps and frame count from avih") {
    val golden = MediaFixtures.aviPayload(fps = 30, nFrames = 42, new Array[Byte](10))
    assert(Multimodal.isAvi(golden))
    assert(Multimodal.aviInfo(golden).contains((30, 42L)))
    val g24 = MediaFixtures.aviPayload(fps = 24, nFrames = 7, Array.emptyByteArray)
    assert(Multimodal.aviInfo(g24).contains((24, 7L)))
  }

  test("bodyOffset matches the generator's header lengths") {
    val txt = "hello-world-body".getBytes("US-ASCII")
    assert(Multimodal.bodyOffset(MediaFixtures.pngPayload(640, 480, txt))
      == MediaFixtures.PngHeaderLen)
    assert(Multimodal.bodyOffset(MediaFixtures.wavPayload(txt))
      == MediaFixtures.WavHeaderLen)
    assert(Multimodal.bodyOffset(MediaFixtures.aviPayload(24, 1, txt))
      == MediaFixtures.AviHeaderLen)
  }

  // ------------------------------------------------- fixture contract

  test("fixture text is ASCII (the m1–m3 oracle byte/char equivalence contract)") {
    val dir = SparkTestSession.sfDir
    val nonAscii = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) =!= length(col("text").cast("binary")))
      .count()
    assert(nonAscii == 0,
      "documents.text must be ASCII: DuckDB 1.0 cannot slice/hash BLOBs, " +
        "so the oracles measure text with char semantics")
  }

  // ------------------------------------------------- twin assertions

  test("mapPartitions decode == column-expression m1 on the fixture") {
    val dir = SparkTestSession.sfDir
    val typed = Multimodal.decode(fixturePayloads)
      .select("doc_id", "modality", "byte_len",
        "width", "height", "duration_ms", "n_frames", "fps")
      .as[(Long, String, Long, Option[Int], Option[Int],
        Option[Long], Option[Long], Option[Int])]
      .collect().toSet
    val viaExpr = Catalog.byName("m1_multimodal_meta").fn(spark, dir)
      .select(col("doc_id"), col("modality"), col("byte_len"),
        col("width").cast("int"), col("height").cast("int"),
        col("duration_ms"), col("n_frames"), col("fps").cast("int"))
      .as[(Long, String, Long, Option[Int], Option[Int],
        Option[Long], Option[Long], Option[Int])]
      .collect().toSet
    assert(typed == viaExpr)
    assert(typed.nonEmpty && typed.forall(_._2 != "unknown"))
  }

  test("frameSample mapPartitions == column-expression m2 on the fixture") {
    val dir = SparkTestSession.sfDir
    val typed = Multimodal.frameSample(fixturePayloads)
      .select("doc_id", "frame_idx", "frame_len", "frame_md5")
      .as[(Long, Long, Long, String)].collect().toSet
    val viaExpr = Catalog.byName("m2_frame_sample").fn(spark, dir)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(typed == viaExpr)
    assert(typed.nonEmpty)
    // sampling kept only every 3rd frame
    assert(typed.forall(_._2 % 3 == 0))
  }

  test("m1 video n_frames == m2's actual frame count per doc") {
    val dir = SparkTestSession.sfDir
    val m1Frames = Catalog.byName("m1_multimodal_meta").fn(spark, dir)
      .filter(col("modality") === "video")
      .select("doc_id", "n_frames").as[(Long, Long)].collect().toMap
    val actual = Multimodal.frameSample(fixturePayloads, everyNth = 1)
      .groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    m1Frames.filter(_._2 > 0).foreach { case (id, n) =>
      assert(actual(id) == n, s"doc $id: m1 says $n frames, sampler found ${actual(id)}")
    }
  }

  test("malformed size fields terminate the walkers instead of spinning") {
    // PNG signature + chunk length 0xFFFFFFF4: naive advance wraps to 0
    val evilPng = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0xff, 0xff, 0xff, 0xf4, 0x41, 0x41, 0x41, 0x41).map(_.toByte)
    assert(Multimodal.pngDims(evilPng).isEmpty)
    // RIFF/WAVE with a chunk size that would advance by zero
    val evilWav = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "junk".getBytes("US-ASCII") ++
      Array(0xf7, 0xff, 0xff, 0xff).map(_.toByte) ++ new Array[Byte](8)
    assert(Multimodal.wavDurationMs(evilWav).isEmpty)
    assert(Multimodal.bodyOffset(evilWav) == -1)
    val evilAvi = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
      "AVI ".getBytes("US-ASCII") ++ "LIST".getBytes("US-ASCII") ++
      Array(0xff, 0xff, 0xff, 0xff).map(_.toByte) ++
      "hdrl".getBytes("US-ASCII") ++ new Array[Byte](16)
    assert(Multimodal.aviInfo(evilAvi).isEmpty)
    // JPEG segment with length 0 (would loop in place)
    val evilJpeg = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x00, 0x41, 0x41)
      .map(_.toByte)
    assert(Multimodal.jpegDims(evilJpeg).isEmpty)
  }

  test("unrecognized payloads decode as unknown with no per-modality fields") {
    val raw = Seq((0L, "just-text")).toDF("doc_id", "t")
      .select(col("doc_id"), col("t").cast("binary").as("payload"))
    val row = Multimodal.decode(raw).collect().head
    assert(row.modality == "unknown" && row.width.isEmpty &&
      row.duration_ms.isEmpty && row.n_frames.isEmpty && row.fps.isEmpty)
    assert(row.byte_len == 9L)
  }
}
