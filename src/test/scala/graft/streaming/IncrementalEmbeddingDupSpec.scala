package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The embedding member of the durable-dedup triple, driven through the
  * shared MinRuleIncremental machinery: planted near-identical vectors
  * (same hyperplane cells) arriving in later slices must be flagged as
  * dups of their earlier originals, across a mid-stream crash, with
  * verdicts equal to the whole-corpus min rule and independent of
  * slicing. */
class IncrementalEmbeddingDupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  /** Deterministic unit-ish vectors; ids ≡ 3 (mod 10) copy the vector
    * of id − 3 exactly (same buckets in every table — a sure dup). */
  private def vec(i: Long): Array[Float] = {
    val base = if (i % 10 == 3) i - 3 else i
    val r = new scala.util.Random(base * 7919)
    Array.fill(64)((r.nextDouble() * 2 - 1).toFloat)
  }

  private def writeSlice(dir: String, idx: Int, ids: Seq[Long]): Unit = {
    // label = i % 3: a copy pair (i, i-3) always shares its label, so
    // label-blocking never separates the planted dups
    ids.map(i => (i, vec(i), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(f"$dir/_tmp_$idx")
    val p = java.nio.file.Paths.get(f"$dir/_tmp_$idx")
    val part = java.nio.file.Files.list(p)
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(part,
      java.nio.file.Paths.get(f"$dir/embeddings-$idx%02d.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
  }

  private def resultSet(workDir: String): Set[(Long, Boolean, Option[Long])] =
    IncrementalEmbeddingDup.results(spark, workDir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  test("crash + restart equals the min rule; sliced == unsliced; dups caught") {
    val docsDir = java.nio.file.Files.createTempDirectory("graft_d14_docs_").toString
    val oneDir = java.nio.file.Files.createTempDirectory("graft_d14_one_").toString
    val w1 = java.nio.file.Files.createTempDirectory("graft_d14_w1_").toString
    val w2 = java.nio.file.Files.createTempDirectory("graft_d14_w2_").toString
    for (s <- 0 until 4) writeSlice(docsDir, s, (s * 10L) until (s * 10L + 10L))
    writeSlice(oneDir, 0, 0L until 40L)
    val crashed = intercept[Exception] {
      IncrementalEmbeddingDup.run(spark, docsDir, w1, failAtBatch = Some(1L))
    }
    assert(String.valueOf(crashed.getMessage).contains("injected crash") ||
      String.valueOf(crashed.getCause).contains("injected crash"),
      s"unexpected failure: $crashed")
    IncrementalEmbeddingDup.run(spark, docsDir, w1)
    IncrementalEmbeddingDup.run(spark, oneDir, w2)
    val got = resultSet(w1)
    assert(got === resultSet(w2), "verdicts depend on slicing")
    // every planted copy (id % 10 == 3, id >= 10: copy of id-3 in an
    // EARLIER slice) must be a dup of a vec no later than its original
    for (i <- Seq(13L, 23L, 33L)) {
      val row = got.find(_._1 == i).get
      assert(!row._2 && row._3.exists(_ <= i - 3), s"copy $i not flagged: $row")
    }
    // exact same-slice copy: 3 copies 0
    assert(got.find(_._1 == 3L).exists(r => !r._2 && r._3.contains(0L)))
    assert(got.exists(_._2), "nobody kept")
  }
}
