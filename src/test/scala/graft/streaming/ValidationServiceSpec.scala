package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The validation service loop: A6's aggregations run on a schedule
  * against live views, exported as counters JSON (reference
  * ValidationManager.java:72-108,155-225). */
class ValidationServiceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def idealView = Seq(
    ("w1", "t", 0, "ONLINE"),
    ("w1", "t", 1, "ONLINE"),
    ("w2", "u", 0, "ONLINE"))
    .toDF("instance", "topic", "partition", "state")

  // injected mismatch: t/1 missing entirely, t/0 flipped to OFFLINE
  private def brokenExternal = Seq(
    ("w1", "t", 0, "OFFLINE"),
    ("w2", "u", 0, "ONLINE"))
    .toDF("instance", "topic", "partition", "state")

  private def field(json: String, name: String): Long = {
    val row = spark.read.json(Seq(json).toDS()).select(name).head()
    row.getLong(0)
  }

  test("an injected view mismatch shows up in the exported counters") {
    val vs = new ValidationService(() => idealView, () => brokenExternal)
    val json = vs.validateOnce()
    // symmetric difference: (t,0,ONLINE) ideal-only, (t,0,OFFLINE)
    // external-only, (t,1,ONLINE) ideal-only
    assert(field(json, "numMismatchedAssignments") == 3)
    assert(field(json, "numErrorTopics") == 1) // t: 2 ideal vs 1 external
    assert(field(json, "numServingTopics") == 2)
    assert(field(json, "numTopicPartitions") == 3)
    assert(field(json, "numOnlineTopicPartitions") == 1)
    assert(field(json, "numOfflineTopicPartitions") == 1)
    assert(json.contains(""""idealPerWorker":{"w1":2,"w2":1}"""))
    assert(json.contains(""""externalPerWorker":{"w1":1,"w2":1}"""))
    assert(vs.countersJson == json)
  }

  test("a healthy cluster validates clean") {
    val vs = new ValidationService(() => idealView, () => idealView)
    val json = vs.validateOnce()
    assert(field(json, "numMismatchedAssignments") == 0)
    assert(field(json, "numErrorTopics") == 0)
    assert(field(json, "numOnlineTopicPartitions") == 3)
  }

  test("a non-leader pass zeroes the export instead of publishing stale counts") {
    @volatile var leader = true
    val vs = new ValidationService(() => idealView, () => brokenExternal,
      isLeader = () => leader)
    vs.validateOnce()
    assert(vs.countersJson.contains(""""validated":true"""))
    leader = false
    vs.validateOnce()
    assert(vs.countersJson == """{"validated":false,"isLeader":false}""")
  }

  test("the pass caches each input once and unpersists it afterwards") {
    // the fused pass must not leak cached views across 60-s cycles: the
    // SAME DataFrame instance handed to the pass is cache-free after it
    val i = idealView
    val e = brokenExternal
    val vs = new ValidationService(() => i, () => e)
    val json = vs.validateOnce()
    assert(field(json, "numMismatchedAssignments") == 3) // fused == unfused
    assert(i.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert(e.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("the scheduled loop observes state changes between passes") {
    @volatile var external = idealView
    val vs = new ValidationService(() => idealView, () => external)
    vs.start(periodSeconds = 1)
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (!vs.countersJson.contains(""""numMismatchedAssignments":0""") &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(vs.countersJson.contains(""""numMismatchedAssignments":0"""))
      external = brokenExternal // inject a live mismatch
      while (!vs.countersJson.contains(""""numMismatchedAssignments":3""") &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(vs.countersJson.contains(""""numMismatchedAssignments":3"""))
    } finally vs.stop()
  }
}
