package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A1–A7 monitoring aggregations (reference
  * controller/core/OffsetMonitor.java, common/core/WorkloadInfoRetriever.java). */
class MonitoringSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("A1: lag = max(latest − committed, 0)") {
    val latest = Seq(("t", 0, 100L), ("t", 1, 50L))
      .toDF("topic", "partition", "latest_offset")
    val committed = Seq(("t", 0, 90L), ("t", 1, 60L))
      .toDF("topic", "partition", "commit_offset")
    val out = Monitoring.partitionLag(latest, committed)
      .select("partition", "lag").as[(Int, Long)].collect().toMap
    assert(out(0) == 10L)
    assert(out(1) == 0L) // committed ahead (stale latest) clamps to 0
  }

  test("A2: stuck = commit unchanged across snapshots while lag > 0") {
    val snapshots = Seq(
      // stuck: commit frozen at 10, latest grows
      ("t", 0, 1000L, 10L, 20L),
      ("t", 0, 2000L, 10L, 30L),
      // healthy: commit advances
      ("t", 1, 1000L, 10L, 20L),
      ("t", 1, 2000L, 25L, 30L),
      // idle: no lag
      ("t", 2, 1000L, 20L, 20L),
      ("t", 2, 2000L, 20L, 20L))
      .toDF("topic", "partition", "snap_ts", "commit_offset", "latest_offset")
    val out = Monitoring.noProgressPartitions(snapshots)
      .select("partition", "snap_ts", "lag").as[(Int, Long, Long)].collect()
    assert(out.toSeq == Seq((0, 2000L, 20L)))
  }

  test("A3: workloadRates buckets by window and divides by period") {
    val raw = Seq(
      ("t", 0L, 600L, 1L), ("t", 10L, 600L, 1L),   // window 0: 1200 B / 600 s
      ("t", 600L, 300L, 1L))                        // window 600: 300 B / 600 s
      .toDF("topic", "epoch", "bytes", "msgs")
      .withColumn("ts", expr("timestamp_seconds(epoch)"))
    val out = Monitoring.workloadRates(raw, 600)
      .select("window_start", "bytes_per_sec").as[(Long, Double)].collect().toMap
    assert(out(0L) == 2.0)
    assert(out(600L) == 0.5)
  }

  test("A3: peakWorkload takes the max window per topic") {
    val rates = Seq(("t", 0L, 2.0, 1.0), ("t", 600L, 5.0, 0.1))
      .toDF("topic", "window_start", "bytes_per_sec", "msgs_per_sec")
    val out = Monitoring.peakWorkload(rates)
      .select("peak_bytes_per_sec", "peak_msgs_per_sec")
      .as[(Double, Double)].collect()
    assert(out.toSeq == Seq((5.0, 1.0)))
  }

  test("A3: lookbackWorkload serves 2-h lookback for fresh topics, 25-h for stale") {
    val now = 1000000L // arbitrary epoch anchor
    val raw = Seq(
      // "fresh": a huge old window inside retention PLUS a recent one —
      // the old peak must be IGNORED (2-h lookback wins)
      ("fresh", now - 20L * 3600, 9000L),
      ("fresh", now - 60L, 600L),
      // "stale": newest sample is 6 h old, so even its 3-h-aligned
      // window END is outside the 2-h lookback — the peak over the FULL
      // 25-h retention serves, picking the max
      ("stale", now - 6L * 3600, 300L),
      ("stale", now - 10L * 3600, 21600L),
      // anchor topic pinning max(ts) = now
      ("anchor", now, 1L),
      // beyond retention: must not resurrect the stale topic's peak
      ("stale", now - 26L * 3600, 999999L))
      .toDF("topic", "epoch", "bytes")
      .withColumn("ts", expr("timestamp_seconds(epoch)"))
      .withColumn("msgs", lit(1L))
    val out = Monitoring.lookbackWorkload(raw)
      .select("topic", "lookback_s", "granularity_s", "serve_bytes_per_sec")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // fresh: served from the 10-min window holding the recent 600 B
    assert(out("fresh")._2 == 7200L)
    assert(out("fresh")._3 == 600L)
    assert(out("fresh")._4 == 1.0) // 600 B / 600 s
    // stale: fell back to 25-h retention, served from a coarse window
    assert(out("stale")._2 == 90000L)
    assert(out("stale")._3 == 10800L)
    assert(out("stale")._4 == 2.0) // 21600 B / 10800 s
  }

  test("A4: instanceWorkload sums partition workloads per instance") {
    val assignment = Seq(("w1", "t", 0), ("w1", "t", 1), ("w2", "t", 2))
      .toDF("instance", "topic", "partition")
    val pw = Seq(("t", 0, 10.0), ("t", 1, 20.0), ("t", 2, 5.0))
      .toDF("topic", "partition", "bytes_per_sec")
    val out = Monitoring.instanceWorkload(assignment, pw)
      .select("instance", "total_bytes_per_sec", "num_partitions")
      .as[(String, Double, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("w1", 30.0, 2L), ("w2", 5.0, 1L)))
  }

  test("A5: expectedWorkers = ceil(total/perWorker) + lagging") {
    val df = Seq((100.0, 2L)).toDF("total", "lagging")
      .select(Monitoring.expectedWorkers(col("total"), 30.0, col("lagging"))
        .as("workers"))
    assert(df.as[Long].head() == 6L) // ceil(100/30)=4 + 2
  }

  test("A6: stateCounts groups by (instance, state)") {
    val assignment = Seq(
      ("w1", "t", 0, "ONLINE"), ("w1", "t", 1, "ONLINE"), ("w1", "t", 2, "ERROR"),
      ("w2", "t", 3, "OFFLINE"))
      .toDF("instance", "topic", "partition", "state")
    val out = Monitoring.stateCounts(assignment)
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("w1", "ONLINE", 2L), ("w1", "ERROR", 1L), ("w2", "OFFLINE", 1L)))
  }

  test("A6: viewMismatch = symmetric difference with side tag") {
    val ideal = Seq(("w1", "t", 0, "ONLINE"), ("w1", "t", 1, "ONLINE"))
      .toDF("instance", "topic", "partition", "state")
    val external = Seq(("w1", "t", 0, "ONLINE"), ("w1", "t", 1, "OFFLINE"))
      .toDF("instance", "topic", "partition", "state")
    val out = Monitoring.viewMismatch(ideal, external)
      .select("partition", "state", "only_in")
      .as[(Int, String, String)].collect().toSet
    assert(out == Set((1, "ONLINE", "ideal"), (1, "OFFLINE", "external")))
  }

  test("A7: topicViewDiff tags topics present in exactly one view") {
    val manager = Seq("a", "b", "c").toDF("topic")
    val controller = Seq("b", "c", "d").toDF("topic")
    val out = Monitoring.topicViewDiff(manager, controller)
      .as[(String, String)].collect().toSet
    assert(out == Set(("a", "manager"), ("d", "controller")))
  }
}
