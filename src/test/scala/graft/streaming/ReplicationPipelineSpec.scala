package graft.streaming

import graft.SparkTestSession
import graft.model.{OffsetRange, PipelineSpec, Route}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * End-to-end replication pipeline tests, mirroring the reference's worker
 * acceptance suite (`uReplicator-Worker/src/test/java/.../
 * WorkerInstanceTest.java`): produce N → replicate → consume N (:131-137),
 * bounded offset ranges (:147-159 — endingOffset 5 ⇒ 25 of 40 records),
 * and checkpoint resume across a restart (:309-338).
 */
class ReplicationPipelineSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** 2 topics × 2 partitions × offsets [from, until) — the
    * WorkerInstanceTest fixture shape. */
  private def makeRecords(from: Int, until: Int): DataFrame =
    (for {
      t <- Seq("click", "view"); p <- 0 to 1; o <- from until until
    } yield (s"k$o", s"payload-$t-$p-$o", t, p, o.toLong))
      .toDF("k", "v", "topic", "partition", "offset")
      .select(col("k").cast("binary").as("key"),
        col("v").cast("binary").as("value"),
        col("topic"), col("partition"), col("offset"),
        expr("timestamp_millis(1700000000000 + offset * 1000)").as("timestamp"))

  private def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val baseSpec = PipelineSpec(
    name = "e2e", route = Route("src", "dst", 0),
    topics = Seq("click", "view"),
    topicMapping = Map("click" -> "click2"),
    dstPartitionCounts = Map("click2" -> 2, "view" -> 2),
    excludeTopicRegex = None)

  test("count parity: produce 40 -> replicate -> consume 40, transformed") {
    val base = tempDir("graft_e2e_")
    val srcDir = s"$base/src"; val outDir = s"$base/out"
    makeRecords(0, 10).write.parquet(srcDir)
    val q = ReplicationPipeline.startFilePipeline(spark, baseSpec, srcDir, outDir)
    q.awaitTermination()
    val out = spark.read.parquet(outDir)
    assert(out.count() == 40)
    // rename applied, remap stays within destination partition count
    assert(out.filter(col("topic") === "click2").count() == 20)
    assert(out.filter(col("topic") === "click").count() == 0)
    assert(out.agg(max("partition")).head.getInt(0) <= 1)
    // streaming output == batch transform of the same source (same chain)
    val batch = ReplicationPipeline.transform(spark.read.parquet(srcDir), baseSpec)
    val key = (df: DataFrame) => df
      .select("topic", "partition", "offset").as[(String, Int, Long)]
      .collect().toSet
    assert(key(out) == key(batch))
  }

  test("bounded ranges: endingOffset 5 on 3 of 4 partitions -> 25 not 40") {
    val base = tempDir("graft_e2e_")
    val srcDir = s"$base/src"; val outDir = s"$base/out"
    makeRecords(0, 10).write.parquet(srcDir)
    val spec = baseSpec.copy(offsetRanges = Seq(
      OffsetRange("click", 0, 0, Some(5)),
      OffsetRange("click", 1, 0, Some(5)),
      OffsetRange("view", 0, 0, Some(5))))
    val q = ReplicationPipeline.startFilePipeline(spark, spec, srcDir, outDir)
    q.awaitTermination()
    val out = spark.read.parquet(outDir)
    assert(out.count() == 25) // 5 + 5 + 5 + 10
    // the unbounded partition kept everything
    assert(out.filter(col("topic") === "view" && col("partition") === 1)
      .count() == 10)
    assert(out.agg(max(when(col("topic") === "click2", col("offset"))))
      .head.getLong(0) == 4L)
  }

  test("checkpoint resume: restart processes only new files, no duplicates") {
    val base = tempDir("graft_e2e_")
    val srcDir = s"$base/src"; val outDir = s"$base/out"
    val spec = baseSpec.copy(checkpointLocation = Some(s"$base/ckpt"))
    val manager = new PipelineManager(spark)
    try {
      makeRecords(0, 5).coalesce(1).write.parquet(srcDir)
      manager.start(spec)(sp =>
        ReplicationPipeline.startFilePipeline(spark, sp, srcDir, outDir))
      manager.awaitAll()
      assert(spark.read.parquet(outDir).count() == 20)
      // new records arrive; restart resumes from the committed offsets
      makeRecords(5, 10).coalesce(1).write.mode("append").parquet(srcDir)
      manager.restart("e2e").get.awaitTermination()
      val out = spark.read.parquet(outDir)
      assert(out.count() == 40)
      assert(out.select("topic", "partition", "offset").distinct().count() == 40)
    } finally manager.shutdown()
  }
}
