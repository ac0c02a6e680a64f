package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once and slicing-invariance of the streaming incremental
  * NEAR-dedup: planted near-dup families (shared word-3-gram shingle
  * sets → shared LSH bands) arrive across slices; a mid-stream crash is
  * injected after a batch's writes but before its checkpoint commit;
  * and the final verdicts must equal the whole-corpus min-rule oracle
  * (m(d) = min doc over d's band buckets; kept iff m(d) == d) no matter
  * how the stream was sliced or crashed. */
class IncrementalNearDupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  /** Texts engineered so some docs are copies/near-copies of docs in
    * EARLIER slices (identical shingle sets → identical signatures →
    * every band shared) and the rest are distinct. */
  private def text(i: Long): String =
    if (i % 5 == 4) // near-dup of the previous multiple-of-5 base doc
      s"alpha beta gamma delta epsilon zeta base${i / 5 * 5}"
    else if (i % 7 == 6) // exact family: same text reappears later
      "the quick brown fox jumps over the lazy dog again"
    else
      s"unique text body number $i with words one two three four $i"

  private def writeSlice(dir: String, idx: Int, ids: Seq[Long]): Unit = {
    ids.map(i => (i, text(i), "en", s"src$idx", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(f"$dir/_tmp_$idx")
    val p = java.nio.file.Paths.get(f"$dir/_tmp_$idx")
    val part = java.nio.file.Files.list(p)
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(part,
      java.nio.file.Paths.get(f"$dir/documents-$idx%02d.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
  }

  /** The non-recursive min-rule oracle computed in one batch pass. */
  private def oracle(docsDir: String): Set[(Long, Boolean, Option[Long])] = {
    val bands = spark.read
      .option("pathGlobFilter", "documents*.parquet").parquet(docsDir)
      .select(col("doc_id"), expr("word_ngrams(text, 3)").as("ws"))
      .filter(size(col("ws")) > 0)
      .withColumn("bh", expr("minhash_lsh_bands(ws)"))
      .select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "band_hash")))
    val bucketMin = bands.groupBy("band", "band_hash")
      .agg(min("doc_id").as("bm"))
    bands.join(bucketMin, Seq("band", "band_hash"))
      .groupBy("doc_id").agg(min("bm").as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1) == r.getLong(0),
        if (r.getLong(1) < r.getLong(0)) Some(r.getLong(1)) else None))
      .toSet
  }

  private def resultSet(workDir: String): Set[(Long, Boolean, Option[Long])] =
    IncrementalNearDup.results(spark, workDir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  test("crash mid-stream, restart: verdicts equal the whole-corpus min rule") {
    val docsDir = java.nio.file.Files.createTempDirectory("graft_d13_docs_").toString
    val workDir = java.nio.file.Files.createTempDirectory("graft_d13_work_").toString
    // 4 slices in doc_id order; dups land in slices AFTER their base doc
    for (s <- 0 until 4) writeSlice(docsDir, s, (s * 10L) until (s * 10L + 10L))
    val crashed = intercept[Exception] {
      IncrementalNearDup.run(spark, docsDir, workDir, failAtBatch = Some(1L))
    }
    assert(String.valueOf(crashed.getMessage)
      .contains("injected crash") ||
      String.valueOf(crashed.getCause).contains("injected crash"),
      s"unexpected failure: $crashed")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$workDir/index/batch=1")),
      "hazard fixture broken: batch 1's index partition should be on disk")
    IncrementalNearDup.run(spark, docsDir, workDir)
    val got = resultSet(workDir)
    val want = oracle(docsDir)
    assert(got === want)
    // the fixture actually exercises cross-slice near-dups
    val dupsAcross = got.collect {
      case (d, false, Some(m)) if d / 10 != m / 10 => (d, m)
    }
    assert(dupsAcross.nonEmpty, "no cross-slice near-dup in fixture")
    assert(got.exists(!_._2) && got.exists(_._2))
  }

  test("sliced == unsliced, and compaction preserves later verdicts") {
    val docsDir = java.nio.file.Files.createTempDirectory("graft_d13b_docs_").toString
    val oneDir = java.nio.file.Files.createTempDirectory("graft_d13b_one_").toString
    val w1 = java.nio.file.Files.createTempDirectory("graft_d13b_w1_").toString
    val w2 = java.nio.file.Files.createTempDirectory("graft_d13b_w2_").toString
    for (s <- 0 until 4) writeSlice(docsDir, s, (s * 10L) until (s * 10L + 10L))
    writeSlice(oneDir, 0, 0L until 40L) // same corpus, ONE slice
    IncrementalNearDup.run(spark, docsDir, w1)
    IncrementalNearDup.run(spark, oneDir, w2)
    assert(resultSet(w1) === resultSet(w2), "verdicts depend on slicing")
    // compact, then stream one more slice with a dup of doc 4's family
    // and a fresh doc — the compacted index must still catch the dup
    // tiny target file size -> multi-file compacted partition, the
    // layout compaction uses at scale (never a single-task write)
    BatchedParquetIndex.compact(spark, s"$w1/index", upToBatch = 3L,
      keyCols = Seq("band", "band_hash"), targetFileBytes = 1024L)
    val idx = new java.io.File(s"$w1/index").listFiles()
      .map(_.getName).filter(n => n.startsWith("batch=") || n.startsWith("compacted="))
    assert(idx.toSeq.sorted === Seq("compacted=3"), s"compaction left: ${idx.toSeq}")
    assert(new java.io.File(s"$w1/index/compacted=3").listFiles()
        .count(_.getName.endsWith(".parquet")) >= 2,
      "compacted index partition is single-file")
    // 97 % 7 == 6 (and 97 % 5 != 4) -> the exact-family text shared
    // with docs 6/13/20/27/34 from the COMPACTED batches; 98 is unique
    writeSlice(docsDir, 4, Seq(97L, 98L))
    IncrementalNearDup.run(spark, docsDir, w1)
    assert(resultSet(w1).exists { case (d, kept, dupOf) =>
      d == 97L && !kept && dupOf.contains(6L) },
      "dup of a compacted-batch doc was not caught")
    assert(resultSet(w1) === oracle(docsDir),
      "verdicts after compaction + later run diverge from the min rule")
  }
}
