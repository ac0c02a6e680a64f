package graft.streaming

import graft.SparkTestSession
import graft.model.{PipelineSpec, Route}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The restart tax, measured. Reference S2 mutates a RUNNING consumer's
 * assignment in place (`W/ConsumerFetcherThread.java:183-240` partition
 * add/remove under a lock) — zero downtime per whitelist change. Spark
 * cannot mutate a running query's source, so this engine's documented
 * plan is checkpoint-preserving restart (stop → update spec → start; the
 * checkpoint carries committed progress). This spec puts a NUMBER and a
 * BOUND on that tax for a many-topic pipeline, and proves the restart
 * neither reprocesses committed records nor loses the new topic's.
 */
class RestartCostSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val nTopics = 200

  private def records(topics: Seq[String], from: Int, until: Int): DataFrame =
    (for (t <- topics; o <- from until until)
      yield (s"k$o", s"v-$t-$o", t, 0, o.toLong))
      .toDF("k", "v", "topic", "partition", "offset")
      .select(col("k").cast("binary").as("key"),
        col("v").cast("binary").as("value"),
        col("topic"), col("partition"), col("offset"))

  test(s"whitelist change on a $nTopics-topic pipeline: bounded restart, no reprocess") {
    val base = java.nio.file.Files.createTempDirectory("graft_restart_").toString
    val topics = (0 until nTopics).map(i => s"topic$i")
    records(topics :+ "late_topic", 0, 5).coalesce(1)
      .write.parquet(s"$base/src")
    val manager = new PipelineManager(spark)
    try {
      def starter(sp: PipelineSpec) = {
        val schema = spark.read.parquet(s"$base/src").schema
        ReplicationPipeline.parquetSink(
          ReplicationPipeline.transform(
            ReplicationPipeline.fileSource(spark, s"$base/src", schema), sp),
          s"$base/out", sp.checkpointLocation.get).start()
      }
      val spec = PipelineSpec(name = "wide", route = Route("src", "dst", 0),
        topics = topics, excludeTopicRegex = None,
        checkpointLocation = Some(s"$base/ckpt"))
      manager.start(spec)(starter _)
      manager.awaitAll()
      val committed = spark.read.parquet(s"$base/out").count()
      assert(committed == nTopics * 5L)

      // THE measured quantity: stop → spec+1 topic → restart → drained.
      // (The already-committed source file is not re-read — the restart
      // pays query teardown + checkpoint resume + an empty microbatch.)
      val t0 = System.nanoTime()
      manager.update(spec.copy(topics = topics :+ "late_topic"))
      manager.awaitAll()
      val restartSec = (System.nanoTime() - t0) / 1e9

      // new files after the change flow, including the added topic; the
      // pre-restart rows are not reprocessed (exactly-once across the
      // restart — the checkpoint survived)
      records(topics :+ "late_topic", 5, 8).coalesce(1)
        .write.mode("append").parquet(s"$base/src")
      manager.restart("wide").get.awaitTermination()
      val out = spark.read.parquet(s"$base/out")
      assert(out.count() == (nTopics + 1) * 3L + nTopics * 5L,
        "restart reprocessed or dropped records")
      assert(out.filter(col("topic") === "late_topic").count() == 3L)

      // the bound: generous against CI noise, but it documents the tax's
      // ORDER — seconds per change, where the reference pays none. The
      // measured value travels in the message for the record.
      assert(restartSec < 30.0,
        f"restart tax for a $nTopics-topic whitelist change: $restartSec%.2f s " +
          "(reference S2 live-mutates for free; restart must stay seconds)")
      info(f"measured restart tax at $nTopics topics: $restartSec%.2f s")
    } finally manager.shutdown()
  }
}
