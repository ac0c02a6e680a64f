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
}
