package graft.streaming

import com.codahale.metrics.Gauge
import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The validation counters must surface through SPARK'S metrics system
  * (reference `KafkaUReplicatorMetricsReporter.java:40`): registered as
  * a named Source, visible to any `spark.metrics.conf` sink, values
  * tracking the live `countersJson`, scrapes running zero Spark jobs. */
class MetricsBridgeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def idealView = Seq(
    ("w1", "t", 0, "ONLINE"),
    ("w1", "t", 1, "ONLINE"),
    ("w2", "u", 0, "ONLINE"))
    .toDF("instance", "topic", "partition", "state")

  private def brokenExternal = Seq(
    ("w1", "t", 0, "OFFLINE"),
    ("w2", "u", 0, "ONLINE"))
    .toDF("instance", "topic", "partition", "state")

  private def gauge(name: String): Long = {
    val regs = MetricsBridge.registries("graft")
    assert(regs.nonEmpty, "graft source must be registered")
    val key = s"validation.$name"
    val g = regs.head.getGauges.get(key)
    assert(g != null, s"gauge $key must exist; have ${regs.head.getGauges.keySet()}")
    g.asInstanceOf[Gauge[Long]].getValue
  }

  test("gauges appear in the local MetricsSystem and track the live counters") {
    @volatile var leader = true
    val vs = new ValidationService(() => idealView, () => brokenExternal,
      isLeader = () => leader)
    val src = MetricsBridge.register(vs)
    try {
      // before any pass: counters absent -> gauges read zero, no crash
      assert(gauge("numMismatchedAssignments") === 0L)
      assert(gauge("isLeader") === 0L)

      vs.validateOnce()
      assert(gauge("numMismatchedAssignments") === 3L)
      assert(gauge("numErrorTopics") === 1L)
      assert(gauge("numServingTopics") === 2L)
      assert(gauge("numTopicPartitions") === 3L)
      assert(gauge("numOnlineTopicPartitions") === 1L)
      assert(gauge("numOfflineTopicPartitions") === 1L)
      assert(gauge("isLeader") === 1L)

      // every exported counter has a registered gauge
      val keys = MetricsBridge.registries("graft").head.getGauges.keySet()
      MetricsBridge.CounterNames.foreach(n =>
        assert(keys.contains(s"validation.$n"), s"missing gauge for $n"))

      // losing the lease zeroes the export (reference cleanupMetrics)
      leader = false
      vs.validateOnce()
      assert(gauge("numMismatchedAssignments") === 0L)
      assert(gauge("isLeader") === 0L)
    } finally MetricsBridge.unregister(src)
    assert(MetricsBridge.registries("graft").isEmpty,
      "unregister must remove the source")
  }

  test("the expiry loop's expiredTotal exports as a gauge when wired") {
    val root = graft.SessionTemp.dir("graft_metrics_groups_")
    graft.sources.FileTopicLog.registerGroup(root, "stale")
    val expiry = new GroupExpiryService(root, ttlMillis = 1L)
    val vs = new ValidationService(() => idealView, () => idealView)
    val src = MetricsBridge.register(vs, "graft", Some(expiry))
    try {
      val gauges = MetricsBridge.registries("graft").head.getGauges
      val g = gauges.get("groups.expiredTotal")
      assert(g != null, s"have ${gauges.keySet()}")
      assert(g.asInstanceOf[Gauge[Long]].getValue === 0L)
      Thread.sleep(5)
      assert(expiry.expireOnce() == Seq("stale"))
      assert(g.asInstanceOf[Gauge[Long]].getValue === 1L)
    } finally MetricsBridge.unregister(src)
  }

  test("a scrape runs zero Spark jobs (driver-local parse only)") {
    val vs = new ValidationService(() => idealView, () => idealView)
    vs.validateOnce() // the pass itself runs jobs — that's fine
    val src = MetricsBridge.register(vs, "graft-scrape-test")
    try {
      val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      val regs = MetricsBridge.registries("graft-scrape-test")
      val values = regs.head.getGauges.values()
      values.forEach(g => { g.asInstanceOf[Gauge[Long]].getValue; () })
      val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      assert(after === before, "gauge reads must not launch Spark jobs")
    } finally MetricsBridge.unregister(src)
  }

  test("re-registration replaces, never duplicates") {
    val vs = new ValidationService(() => idealView, () => idealView)
    val s1 = MetricsBridge.register(vs, "graft-dup-test")
    val s2 = MetricsBridge.register(vs, "graft-dup-test")
    try {
      assert(MetricsBridge.registries("graft-dup-test").length === 1)
      assert(s1 ne s2)
    } finally MetricsBridge.unregister(s2)
  }
}
