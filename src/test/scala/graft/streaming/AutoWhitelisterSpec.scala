package graft.streaming

import graft.SparkTestSession
import graft.model.{PipelineSpec, Route}
import graft.sources.TopicCatalogObserver
import org.scalatest.funsuite.AnyFunSuite

/** F1 auto-whitelist service: observers → F3 candidates → spec update. */
class AutoWhitelisterSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def observer(topics: (String, Int)*): TopicCatalogObserver =
    new TopicCatalogObserver(() =>
      topics.toSeq.toDF("topic", "num_partitions"))

  test("candidates = src ∩ dst − serving − blacklist − regex; spec updated") {
    val manager = new PipelineManager(spark)
    manager.update(PipelineSpec(
      name = "r1", route = Route("a", "b", 0), topics = Seq("click")))
    val src = observer("click" -> 4, "view" -> 2, "purchase" -> 3,
      "__consumer_offsets" -> 50, "srcOnly" -> 1)
    val dst = observer("click" -> 4, "view" -> 2, "purchase" -> 3,
      "__consumer_offsets" -> 50, "banned" -> 1)
    val wl = new AutoWhitelister(manager, src, dst, () => Set("purchase"))
    val added = wl.runOnce("r1")
    assert(added == Seq("view")) // click serving, purchase blacklisted,
                                 // __* regex-excluded, srcOnly not in dst
    assert(manager.spec("r1").get.topics.sorted == Seq("click", "view"))
    // second pass is idempotent
    assert(wl.runOnce("r1").isEmpty)
  }

  test("unknown pipeline adds nothing") {
    val manager = new PipelineManager(spark)
    val obs = observer("t" -> 1)
    val wl = new AutoWhitelister(manager, obs, obs, () => Set.empty)
    assert(wl.runOnce("nope").isEmpty)
  }

  test("in-flight mode: F1 add reaches a RUNNING dynamic-source query, no restart") {
    import graft.sources.FileTopicLog
    import java.nio.charset.StandardCharsets
    val root = java.nio.file.Files.createTempDirectory("graft_wl_log_").toString
    val base = java.nio.file.Files.createTempDirectory("graft_wl_q_").toString
    def recs(t: String, n: Int) = (0 until n).map(i => FileTopicLog.LogRecord(
      null, s"$t$i".getBytes(StandardCharsets.UTF_8), 1700000000000L + i))
    FileTopicLog.append(root, "click", 0, recs("c", 5))
    FileTopicLog.append(root, "view", 0, recs("v", 7))
    FileTopicLog.setWhitelist(root, Seq("click"))

    val manager = new PipelineManager(spark)
    manager.update(PipelineSpec(
      name = "r1", route = Route("a", "b", 0), topics = Seq("click")))
    val q = spark.readStream.format("graft-topiclog").option("path", root)
      .load().selectExpr("topic", "offset")
      .writeStream.format("parquet")
      .option("path", s"$base/sink")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$base/sink").count() === 5)
      val runId = q.runId

      val src = observer("click" -> 1, "view" -> 1)
      val dst = observer("click" -> 1, "view" -> 1)
      val wl = new AutoWhitelister(manager, src, dst, () => Set.empty,
        topicLogRoot = Some(root))
      assert(wl.runOnce("r1") === Seq("view"))
      assert(manager.spec("r1").get.topics.sorted === Seq("click", "view"))

      q.processAllAvailable()
      assert(q.runId === runId, "in-flight add must not restart the query")
      assert(spark.read.parquet(s"$base/sink")
        .filter("topic = 'view'").count() === 7)
    } finally q.stop()
  }
}
