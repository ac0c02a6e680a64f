package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.FileTopicLog.LogRecord
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/**
 * The S2 closure: in-flight topic assignment on a RUNNING query.
 *
 * The reference mutates a live fetcher's partition map
 * (`worker/ConsumerFetcherThread.java:183-240`, addPartitions /
 * removePartitions called from the thread owning the consumer); these
 * tests pin the Spark-native equivalent — `graft-topiclog` re-reads the
 * whitelist at every micro-batch boundary — including the properties a
 * restart-based swap cannot express: the SAME run (one runId) observes
 * the assignment change, frozen topics resume exactly where they
 * stopped, and offsets stay exactly-once across both the change and a
 * crash/restart.
 */
class DynamicTopicLogSpec extends AnyFunSuite {

  private lazy val s: SparkSession = graft.SparkTestSession.spark

  private def b(x: String): Array[Byte] = x.getBytes(StandardCharsets.UTF_8)

  private def rec(i: Int): LogRecord =
    LogRecord(b(s"k$i"), b(s"v$i"), 1700000000000L + i,
      headers = Seq("seq" -> b(i.toString)))

  private def freshRoot(): String =
    Files.createTempDirectory("graft_dynlog_").toString

  private def startQuery(root: String, ckpt: String, sink: String,
      maxRows: Option[Long] = None): StreamingQuery = {
    val base = s.readStream.format("graft-topiclog").option("path", root)
    val src = maxRows.fold(base)(n => base.option("maxRowsPerTrigger", n.toString))
    src.load()
      .selectExpr("cast(key as string) AS k", "cast(value as string) AS v",
        "topic", "partition", "offset",
        "cast(headers[0].value as string) AS seq")
      .writeStream
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
  }

  private def sinkDf(sink: String): DataFrame = s.read.parquet(sink)

  test("log read/write round-trips records with offsets, seek is honored") {
    val root = freshRoot()
    FileTopicLog.append(root, "a", 0, (0 until 10).map(rec))
    FileTopicLog.append(root, "a", 0, (10 until 15).map(rec))
    assert(FileTopicLog.committedCount(root, "a", 0) === 15)
    val all = FileTopicLog.read(root, "a", 0, 0, 15).toSeq
    assert(all.map(_._1) === (0L until 15L))
    assert(all.map(t => new String(t._2.value, StandardCharsets.UTF_8)) ===
      (0 until 15).map(i => s"v$i"))
    // mid-log seek: [7, 12)
    val mid = FileTopicLog.read(root, "a", 0, 7, 12).toSeq
    assert(mid.map(_._1) === (7L until 12L))
    assert(new String(mid.head._2.key, StandardCharsets.UTF_8) === "k7")
    assert(mid.head._2.headers.map { case (k, v) =>
      (k, new String(v, StandardCharsets.UTF_8)) } === Seq("seq" -> "7"))
    // until past the committed count truncates, from past it is empty
    assert(FileTopicLog.read(root, "a", 0, 12, 99).size === 3)
    assert(FileTopicLog.read(root, "a", 0, 15, 99).isEmpty)
  }

  test("offset JSON round-trips (sorted, deterministic)") {
    val o = TopicLogOffset(Map(
      "zz" -> Map(1 -> 7L, 0 -> 12L), "aa" -> Map(3 -> 0L)))
    val j = o.json()
    assert(j === """{"aa":{"3":0},"zz":{"0":12,"1":7}}""")
    assert(TopicLogOffset.fromJson(j) === o)
  }

  test("in-flight add and remove: one runId observes both assignment changes") {
    val root = freshRoot()
    val base = Files.createTempDirectory("graft_dynq_").toString
    FileTopicLog.append(root, "alpha", 0, (0 until 10).map(rec))
    FileTopicLog.append(root, "beta", 0, (0 until 10).map(rec))
    FileTopicLog.setWhitelist(root, Seq("alpha"))

    val q = startQuery(root, s"$base/ckpt", s"$base/sink")
    try {
      q.processAllAvailable()
      val phase1 = sinkDf(s"$base/sink")
      assert(phase1.select("topic").distinct().collect().map(_.getString(0)).toSet
        === Set("alpha"), "phase 1 must only see the whitelisted topic")
      assert(phase1.count() === 10)
      val runId = q.runId

      // F1 in flight: add beta — no stop, no new query
      FileTopicLog.setWhitelist(root, Seq("alpha", "beta"))
      FileTopicLog.append(root, "alpha", 0, (10 until 12).map(rec))
      q.processAllAvailable()
      val phase2 = sinkDf(s"$base/sink")
      assert(q.runId === runId, "assignment change must not restart the query")
      assert(phase2.filter("topic = 'beta'").count() === 10,
        "added topic starts from earliest")
      assert(phase2.filter("topic = 'alpha'").count() === 12)

      // F2 in flight: remove alpha — frozen, beta keeps flowing
      FileTopicLog.setWhitelist(root, Seq("beta"))
      FileTopicLog.append(root, "alpha", 0, (12 until 14).map(rec))
      FileTopicLog.append(root, "beta", 0, (10 until 13).map(rec))
      q.processAllAvailable()
      val phase3 = sinkDf(s"$base/sink")
      assert(q.runId === runId)
      assert(phase3.filter("topic = 'alpha'").count() === 12,
        "removed topic must freeze (no new rows)")
      assert(phase3.filter("topic = 'beta'").count() === 13)

      // re-add alpha: resumes at the frozen offset — no replay, no gap
      FileTopicLog.setWhitelist(root, Seq("alpha", "beta"))
      q.processAllAvailable()
      val phase4 = sinkDf(s"$base/sink").filter("topic = 'alpha'")
      assert(phase4.count() === 14)
      assert(phase4.select("offset").collect().map(_.getLong(0)).sorted
        === (0L until 14L).toArray, "offsets contiguous across remove/re-add")
    } finally q.stop()
  }

  test("exactly-once across stop + checkpoint resume") {
    val root = freshRoot()
    val base = Files.createTempDirectory("graft_dynq_").toString
    FileTopicLog.setWhitelist(root, Seq("t"))
    FileTopicLog.append(root, "t", 0, (0 until 8).map(rec))
    FileTopicLog.append(root, "t", 1, (0 until 5).map(rec))

    val q1 = startQuery(root, s"$base/ckpt", s"$base/sink")
    try { q1.processAllAvailable() } finally q1.stop()
    assert(sinkDf(s"$base/sink").count() === 13)

    // more data lands while "down"; resume from the same checkpoint
    FileTopicLog.append(root, "t", 0, (8 until 11).map(rec))
    val q2 = startQuery(root, s"$base/ckpt", s"$base/sink")
    try { q2.processAllAvailable() } finally q2.stop()
    val rows = sinkDf(s"$base/sink")
    assert(rows.count() === 16, "no replay, no loss across restart")
    assert(rows.filter("partition = 0").select("offset").collect()
      .map(_.getLong(0)).sorted === (0L until 11L).toArray)
    // exactly-once: every (topic, partition, offset) appears exactly once
    assert(rows.select("topic", "partition", "offset").distinct().count() === 16)
  }

  test("maxRowsPerTrigger paces batches through admission control") {
    val root = freshRoot()
    val base = Files.createTempDirectory("graft_dynq_").toString
    FileTopicLog.setWhitelist(root, Seq("t"))
    FileTopicLog.append(root, "t", 0, (0 until 30).map(rec))

    val q = startQuery(root, s"$base/ckpt", s"$base/sink", maxRows = Some(7L))
    try {
      q.processAllAvailable()
      assert(sinkDf(s"$base/sink").count() === 30)
      val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batchSizes.nonEmpty && batchSizes.forall(_ <= 7),
        s"every batch within the cap, got ${batchSizes.mkString(",")}")
      assert(batchSizes.length >= 5, "cap must force multiple batches")
    } finally q.stop()
  }

  test("runtime rate change (R1) tightens and releases batches in flight") {
    val root = freshRoot()
    val base = Files.createTempDirectory("graft_dynq_").toString
    FileTopicLog.setWhitelist(root, Seq("t"))
    FileTopicLog.append(root, "t", 0, (0 until 20).map(rec))

    val q = startQuery(root, s"$base/ckpt", s"$base/sink")
    try {
      q.processAllAvailable() // batch 1: uncapped, all 20
      val uncapped = q.recentProgress.map(_.numInputRows).max
      assert(uncapped === 20, "no rate file → all available in one batch")

      // PUT /ratelimiter analog: cap to 4 rows/trigger on the RUNNING query
      FileTopicLog.setRate(root, Some(4L))
      FileTopicLog.append(root, "t", 0, (20 until 32).map(rec))
      q.processAllAvailable()
      val capped = q.recentProgress.map(_.numInputRows)
        .filter(n => n > 0 && n != 20)
      assert(capped.nonEmpty && capped.forall(_ <= 4),
        s"capped batches must be <= 4, got ${capped.mkString(",")}")
      assert(capped.length >= 3, "12 rows at cap 4 needs >= 3 batches")

      // release the cap, again in flight
      FileTopicLog.setRate(root, None)
      FileTopicLog.append(root, "t", 0, (32 until 42).map(rec))
      q.processAllAvailable()
      assert(sinkDf(s"$base/sink").count() === 42)
      val released = q.recentProgress.map(_.numInputRows).filter(_ > 4)
      assert(released.exists(_ >= 10), "released cap → wide batch again")
    } finally q.stop()
  }

  test("availableNow drains the start-time snapshot and terminates") {
    val root = freshRoot()
    val base = Files.createTempDirectory("graft_dynq_").toString
    FileTopicLog.setWhitelist(root, Seq("t"))
    FileTopicLog.append(root, "t", 0, (0 until 12).map(rec))

    val q = s.readStream.format("graft-topiclog").option("path", root)
      .option("maxRowsPerTrigger", "5")
      .load()
      .selectExpr("cast(value as string) AS v", "offset")
      .writeStream.format("parquet")
      .option("path", s"$base/sink")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(sinkDf(s"$base/sink").count() === 12)
  }
}
