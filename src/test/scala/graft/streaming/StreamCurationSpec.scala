package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The streaming curation funnel (p21): the p19 stage list over an
  * accumulated pool with the dedup stage served by d12's
  * incrementally-maintained keeper index — pinned ≡ the all-batch p19
  * funnel under multi-batch arrival AND a mid-stream crash/replay
  * (the index's exactly-once is IncrementalDedupSpec's job; this spec
  * pins that the COMPOSITION inherits it). */
class StreamCurationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def writeSlice(dir: String, idx: Int,
      rows: Seq[(Long, String, String)]): Unit = {
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(f"$dir/_tmp_$idx")
    val p = java.nio.file.Paths.get(f"$dir/_tmp_$idx")
    val ls = java.nio.file.Files.list(p)
    val part =
      try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally ls.close()
    java.nio.file.Files.move(part,
      java.nio.file.Paths.get(f"$dir/documents-$idx%02d.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
  }

  /** 4 slices × 15 docs with CROSS-SLICE exact duplicates (id % 6
    * picks the text, so later slices repeat earlier content — the
    * keeper index must drop them), multiple sources, and enough
    * token variety for a non-trivial quality metric. */
  private def writeSlices(dir: String): Unit =
    for (slice <- 0 until 4)
      writeSlice(dir, slice, (0 until 15).map { i =>
        val id = slice * 15L + i
        val toks = (0 to (id % 6).toInt + 3)
          .map(j => s"w${(id % 6) * 7 + j}")
        (id, toks.mkString(" "), s"src${id % 4}")
      })

  private def docs(dir: String) =
    spark.read.option("pathGlobFilter", "documents*.parquet").parquet(dir)

  private def weights = (0 until 4)
    .map(i => (s"src$i", if (i < 2) 300000L else 100000L))
    .toDF("source", "w_micro")

  private def funnelOver(d: org.apache.spark.sql.DataFrame,
      dedup: graft.operators.Curation.Stage) = {
    import graft.operators.Curation
    Curation.funnel(d, Seq(
      dedup,
      Curation.decontaminate(pmod(col("doc_id"), lit(7)) === 0),
      Curation.qualityMetric(carryCols = Seq("source")),
      Curation.domainMix(weights)))
      .orderBy("source", "doc_id").collect().map(_.toSeq).toSeq
  }

  test("stream-indexed funnel ≡ the all-batch funnel, through a mid-stream crash + restart") {
    val docsDir = java.nio.file.Files.createTempDirectory("graft_p21_docs_").toString
    val workDir = java.nio.file.Files.createTempDirectory("graft_p21_work_").toString
    writeSlices(docsDir)
    val crashed = intercept[Exception] {
      IncrementalDedup.run(spark, docsDir, workDir, failAtBatch = Some(2L))
    }
    assert(crashed.getMessage != null &&
      (crashed.getMessage.contains("injected crash") ||
        String.valueOf(crashed.getCause).contains("injected crash")),
      s"unexpected failure: $crashed")
    IncrementalDedup.run(spark, docsDir, workDir)
    val d = docs(docsDir)
    // the fixture genuinely exercises cross-slice dedup: fewer keepers
    // than docs
    val kept = IncrementalDedup.kept(spark, workDir)
    assert(kept.count() < d.count(),
      "no cross-slice duplicates — the index stage is inert")
    val viaIndex = funnelOver(d,
      graft.operators.Curation.exactDedupKept(kept))
    val viaBatch = funnelOver(d, graft.operators.Curation.exactDedup())
    assert(viaIndex === viaBatch,
      "stream-indexed funnel drifted from the all-batch p19 funnel")
    assert(viaIndex.nonEmpty, "empty mix — the fixture selects nothing")
  }
}
