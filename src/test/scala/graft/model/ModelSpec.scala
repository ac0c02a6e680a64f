package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Control-plane model: Route round-trip, OffsetRange bounds, topic-mapping
  * parser (reference worker/WorkerUtils.java:67-78,
  * worker/WorkerInstance.java:385-397). */
class ModelSpec extends AnyFunSuite {

  test("Route renders and parses @src@dst@id") {
    val r = Route("clusterA", "clusterB", 7)
    assert(r.render == "@clusterA@clusterB@7")
    assert(Route.parse(r.render) == r)
  }

  test("Route parse rejects malformed strings") {
    intercept[IllegalArgumentException](Route.parse("@only@two"))
  }

  test("Route round-trip holds for seeded random names") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val a = rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString
      val r = Route(a, b, rnd.nextInt(1000))
      assert(Route.parse(r.render) == r)
    }
  }

  test("OffsetRange bounded/unbounded semantics") {
    val bounded = OffsetRange("t", 0, 2, Some(10))
    assert(bounded.bounded)
    assert(bounded.contains(2) && bounded.contains(9))
    assert(!bounded.contains(10) && !bounded.contains(1))
    val unbounded = OffsetRange("t", 0, 5, None)
    assert(!unbounded.bounded)
    assert(unbounded.contains(Long.MaxValue - 1))
    assert(!unbounded.contains(4))
  }

  test("parseTopicMapping accepts '=' and whitespace separators, skips comments") {
    val lines = Iterator(
      "# comment", "", "srcA=dstA", "srcB dstB", "  srcC\tdstC  ", "junkline")
    val m = PipelineSpec.parseTopicMapping(lines)
    assert(m == Map("srcA" -> "dstA", "srcB" -> "dstB", "srcC" -> "dstC"))
  }

  test("TopicWorkload per-partition rate guards against zero partitions") {
    assert(TopicWorkload("t", 100.0, 10.0, 4).bytesPerSecondPerPartition == 25.0)
    assert(TopicWorkload("t", 100.0, 10.0, 0).bytesPerSecondPerPartition == 100.0)
  }

  test("PartitionLag never negative") {
    assert(PartitionLag("t", 0, 10, 15, 0).lag == 0)
    assert(PartitionLag("t", 0, 15, 10, 0).lag == 5)
  }
}
