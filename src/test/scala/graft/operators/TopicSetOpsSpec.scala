package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F2–F6 topic-set algebra (reference
  * controller/core/AutoTopicWhitelistingManager.java:164-203). */
class TopicSetOpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def topics(ts: String*) = ts.toDF("topic")

  test("F3: candidates = (src ∩ dst) − serving − blacklist − regex") {
    val src = topics("a", "b", "c", "d", "__internal", "x_19")
    val dst = topics("a", "b", "c", "__internal", "x_19")
    val serving = topics("b")
    val blacklist = topics("c")
    val out = TopicSetOps.autoWhitelistCandidates(
      src, dst, serving, blacklist, "^__|_1[0-9]$")
      .as[String].collect().sorted
    assert(out.toSeq == Seq("a"))
  }

  test("F4: excludeByRegex drops matches only") {
    val out = TopicSetOps.excludeByRegex(
      topics("ok", "__consumer_offsets", "__tx"), "^__")
      .as[String].collect()
    assert(out.toSeq == Seq("ok"))
  }

  test("F5: partition blacklist anti-join removes exactly the listed pairs") {
    val recs = Seq(("t", 0), ("t", 1), ("u", 0)).toDF("topic", "partition")
    val bl = Seq(("t", 1)).toDF("topic", "partition")
    val out = TopicSetOps.applyPartitionBlacklist(recs, bl)
      .select("topic", "partition").as[(String, Int)].collect().toSet
    assert(out == Set(("t", 0), ("u", 0)))
  }

  test("F2: topic blacklist removes all partitions of the topic") {
    val recs = Seq(("t", 0), ("t", 1), ("u", 0)).toDF("topic", "partition")
    val out = TopicSetOps.applyTopicBlacklist(recs, topics("t"))
      .select("topic").as[String].collect()
    assert(out.toSeq == Seq("u"))
  }

  test("F6: detectExpandedTopics finds only grown topics") {
    val serving = Seq(("a", 4), ("b", 2)).toDF("topic", "partition_count")
    val observed = Seq(("a", 6), ("b", 2)).toDF("topic", "partition_count")
    val out = TopicSetOps.detectExpandedTopics(serving, observed)
      .as[(String, Int, Int)].collect()
    assert(out.toSeq == Seq(("a", 4, 6)))
  }

  test("F3 mismatch arm: partition-count disagreement across clusters") {
    val src = Seq(("a", 4), ("b", 2)).toDF("topic", "partition_count")
    val dst = Seq(("a", 4), ("b", 3)).toDF("topic", "partition_count")
    val out = TopicSetOps.partitionMismatchedTopics(src, dst)
      .as[(String, Int, Int)].collect()
    assert(out.toSeq == Seq(("b", 2, 3)))
  }

  test("F5 plan shape: blacklist join is broadcast, not shuffle") {
    val recs = Seq(("t", 0), ("t", 1)).toDF("topic", "partition")
    val bl = Seq(("t", 1)).toDF("topic", "partition")
    val plan = TopicSetOps.applyPartitionBlacklist(recs, bl)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join in:\n$plan")
  }
}
