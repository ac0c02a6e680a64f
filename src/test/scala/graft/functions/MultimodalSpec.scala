package graft.functions

import graft.SparkTestSession
import graft.queries.Catalog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal decode plumbing: the typed mapPartitions path must agree
  * with the column-expression twin that sits under the DuckDB gate. */
class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("mapPartitions decode == column-expression m1 on the fixture") {
    val dir = SparkTestSession.sfDir
    val payloads = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val typed = Multimodal.decode(payloads)
      .select("doc_id", "modality", "byte_len", "payload_md5",
        "width", "height", "duration_ms", "n_frames", "fps")
      .as[(Long, String, Long, String, Option[Int], Option[Int],
        Option[Long], Option[Long], Option[Int])]
      .collect().toSet
    val viaExpr = Catalog.byName("m1_multimodal_meta").fn(spark, dir)
      .select(col("doc_id"), col("modality"), col("byte_len"), col("payload_md5"),
        col("width").cast("int"), col("height").cast("int"),
        col("duration_ms"), col("n_frames"), col("fps").cast("int"))
      .as[(Long, String, Long, String, Option[Int], Option[Int],
        Option[Long], Option[Long], Option[Int])]
      .collect().toSet
    assert(typed == viaExpr)
  }

  test("frameSample mapPartitions == column-expression m2 on the fixture") {
    val dir = SparkTestSession.sfDir
    val payloads = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val typed = Multimodal.frameSample(payloads)
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
    val payloads = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val actual = Multimodal.frameSample(payloads, everyNth = 1)
      .groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    m1Frames.foreach { case (id, n) =>
      assert(actual(id) == n, s"doc $id: m1 says $n frames, sampler found ${actual(id)}")
    }
  }

  test("per-modality fields are null exactly off-modality") {
    val payloads = Seq(
      (0L, "img-bytes"), (1L, "aud-bytes"), (2L, "vid-bytes"))
      .toDF("doc_id", "t")
      .select(col("doc_id"), col("t").cast("binary").as("payload"))
    val rows = Multimodal.decode(payloads).collect().sortBy(_.doc_id)
    val img = rows(0); val aud = rows(1); val vid = rows(2)
    assert(img.modality == "image" && img.width.isDefined &&
      img.height.isDefined && img.duration_ms.isEmpty && img.fps.isEmpty)
    assert(aud.modality == "audio" && aud.duration_ms.contains(9L * 125) &&
      aud.width.isEmpty && aud.n_frames.isEmpty)
    assert(vid.modality == "video" && vid.n_frames.contains(1L) &&
      vid.fps.exists(f => f == 24 || f == 30) && vid.width.isEmpty)
    // dims land in the stub's deterministic ranges
    assert(img.width.exists(w => w >= 160 && w <= 1280 && w % 160 == 0))
    assert(img.height.exists(h => h >= 120 && h <= 960 && h % 120 == 0))
  }
}
