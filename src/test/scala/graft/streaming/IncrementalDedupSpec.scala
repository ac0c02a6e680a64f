package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once of the durable-index streaming dedup under a mid-stream
  * crash: a 4-slice document stream with duplicates planted within AND
  * across slices is killed after batch 1's writes land but before its
  * checkpoint commits; the restarted query must replay that batch onto
  * its own partial output (overwrite, not append) without seeing the
  * failed attempt's index rows (which would drop the whole batch), and
  * finish with exactly the batch-oracle kept set. */
class IncrementalDedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def writeSlices(dir: String): Unit = {
    // 4 slices x 10 docs; text cycles with period 7 within a slice base
    // of 10 distinct strings -> dups within a slice AND across slices
    for (slice <- 0 until 4) {
      (0 until 10).map { i =>
        val docId = slice * 10L + i
        val text = s"doc text ${(slice * 10 + i) % 7} ${(i % 3)}"
        (docId, text, "en", s"src$slice", text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(f"$dir/_tmp_$slice")
      val p = java.nio.file.Paths.get(f"$dir/_tmp_$slice")
      val part = java.nio.file.Files.list(p)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part,
        java.nio.file.Paths.get(f"$dir/documents-$slice%02d.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
    }
  }

  test("crash after batch-1 writes, restart: kept table is exact, no dupes") {
    val docsDir = java.nio.file.Files.createTempDirectory("graft_d12_docs_").toString
    val workDir = java.nio.file.Files.createTempDirectory("graft_d12_work_").toString
    writeSlices(docsDir)
    // first run: injected crash on batch 1 (second slice), AFTER its
    // kept/index partitions are written
    val crashed = intercept[Exception] {
      IncrementalDedup.run(spark, docsDir, workDir, failAtBatch = Some(1L))
    }
    assert(crashed.getMessage != null &&
      (crashed.getMessage.contains("injected crash") ||
        String.valueOf(crashed.getCause).contains("injected crash")),
      s"unexpected failure: $crashed")
    // the failed attempt's partitions exist on disk — the hazard is real
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$workDir/index/batch=1")))
    // restart: replays batch 1 (same id, same file), then finishes 2..3
    IncrementalDedup.run(spark, docsDir, workDir)
    val kept = IncrementalDedup.kept(spark, workDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val oracle = spark.read
      .option("pathGlobFilter", "documents*.parquet").parquet(docsDir)
      .groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(kept.map(_._1).distinct.length === kept.length,
      "duplicate content_hash in kept — replay appended instead of overwrote")
    assert(kept.toSet === oracle.toSet,
      s"kept ${kept.length} rows != oracle ${oracle.length}")
    // cross-slice dedup actually happened: fewer keepers than docs
    assert(kept.length < 40 && kept.length === 19)
  }

  test("index compaction preserves results across a later incremental run") {
    val docsDir = java.nio.file.Files.createTempDirectory("graft_d12c_docs_").toString
    val workDir = java.nio.file.Files.createTempDirectory("graft_d12c_work_").toString
    writeSlices(docsDir)
    IncrementalDedup.run(spark, docsDir, workDir)
    val before = IncrementalDedup.kept(spark, workDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // compact batches 0..3 into one partition, then stream MORE data
    // (a 5th slice with one new text and one known dup) through the
    // SAME checkpoint — the compacted index must still dedup it
    IncrementalDedup.compactIndex(spark, workDir, upToBatch = 3L)
    val idx = new java.io.File(s"$workDir/index")
      .listFiles().map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(idx === Seq("batch=3"), s"compaction left: $idx")
    Seq((100L, "doc text 0 0", "en", "src9", 12L), // dup of doc 0
        (101L, "brand new text", "en", "src9", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$docsDir/_tmp_4")
    val p = java.nio.file.Paths.get(s"$docsDir/_tmp_4")
    val part = java.nio.file.Files.list(p)
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(part,
      java.nio.file.Paths.get(s"$docsDir/documents-04.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
    IncrementalDedup.run(spark, docsDir, workDir)
    val after = IncrementalDedup.kept(spark, workDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after.size === before.size + 1, "dup slipped past the compacted index")
    assert((after -- before).map(_._2) === Set(101L))
  }
}
