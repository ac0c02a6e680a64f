package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming stateful detectors (A2 continuous form) and event-time
  * aggregations, driven through MemoryStream — the first executable
  * coverage of the flatMapGroupsWithState path. */
class DetectorsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("A2 streaming: stuck partition flagged only after threshold with lag") {
    val input = MemoryStream[OffsetSnapshot]
    val out = Detectors.noProgress(input.toDS(), stuckAfterSeconds = 600)
    val q = out.writeStream.format("memory").queryName("a2_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // t=0: baseline; t=300: commit advanced on A, stalled on B (below
      // threshold); t=700: B still stalled past threshold with lag
      input.addData(
        OffsetSnapshot("t", 0, 0L, 10L, 20L),
        OffsetSnapshot("t", 1, 0L, 10L, 20L))
      q.processAllAvailable()
      input.addData(
        OffsetSnapshot("t", 0, 300L, 15L, 25L),
        OffsetSnapshot("t", 1, 300L, 10L, 25L))
      q.processAllAvailable()
      input.addData(
        OffsetSnapshot("t", 0, 700L, 20L, 30L),
        OffsetSnapshot("t", 1, 700L, 10L, 30L))
      q.processAllAvailable()
      val rows = spark.table("a2_stream").as[StuckPartition].collect()
      assert(rows.map(r => (r.topic, r.partition)).toSet == Set(("t", 1)))
      val stuck = rows.head
      assert(stuck.sinceTs == 0L && stuck.snapTs == 700L && stuck.lag == 20L)
    } finally q.stop()
  }

  test("A2 streaming: advancing commit resets the stuck clock") {
    val input = MemoryStream[OffsetSnapshot]
    val out = Detectors.noProgress(input.toDS(), stuckAfterSeconds = 600)
    val q = out.writeStream.format("memory").queryName("a2_reset")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(OffsetSnapshot("t", 0, 0L, 10L, 20L))
      q.processAllAvailable()
      input.addData(OffsetSnapshot("t", 0, 650L, 15L, 20L)) // advanced
      q.processAllAvailable()
      input.addData(OffsetSnapshot("t", 0, 1200L, 15L, 30L)) // 550s < 600s
      q.processAllAvailable()
      assert(spark.table("a2_reset").count() == 0)
    } finally q.stop()
  }

  test("A3 streaming: windowed workload rates over event time") {
    val input = MemoryStream[(java.sql.Timestamp, String, Long, Long)]
    val raw = input.toDF().toDF("ts", "topic", "bytes", "msgs")
    val rates = Detectors.workloadRatesStream(raw, windowSeconds = 600)
    val q = rates.writeStream.format("memory").queryName("a3_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
      input.addData(
        (ts(0), "t", 6000L, 60L), (ts(300), "t", 6000L, 60L),
        (ts(700), "t", 1200L, 12L))
      q.processAllAvailable()
      val rows = spark.table("a3_stream")
        .select("topic", "bytes_per_sec", "msgs_per_sec")
        .as[(String, Double, Double)].collect().sortBy(_._2)
      assert(rows.length == 2) // two 10-min windows
      assert(rows(0) == (("t", 2.0, 0.02))) // 1200/600
      assert(rows(1) == (("t", 20.0, 0.2))) // 12000/600
    } finally q.stop()
  }

  test("S7 streaming: re-delivered offsets dedup across micro-batches") {
    // the reference's ConsumerIterator skips records below consumeOffset
    // after a re-fetch (`worker/ConsumerIterator.java:81-83`); the
    // streaming analog dedups on (topic, partition, offset) with state
    // bounded by the watermark
    val input = MemoryStream[(java.sql.Timestamp, String, Int, Long)]
    val records = input.toDF().toDF("ts", "topic", "partition", "offset")
    val deduped = records
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("topic", "partition", "offset")
    val q = deduped.writeStream.format("memory").queryName("s7_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
      input.addData((ts(0), "t", 0, 0L), (ts(1), "t", 0, 1L))
      q.processAllAvailable()
      // re-fetch re-delivers offsets 0-1 plus new offset 2
      input.addData((ts(2), "t", 0, 0L), (ts(2), "t", 0, 1L), (ts(3), "t", 0, 2L))
      q.processAllAvailable()
      val offsets = spark.table("s7_stream")
        .select("offset").as[Long].collect().sorted
      assert(offsets.toSeq == Seq(0L, 1L, 2L))
    } finally q.stop()
  }

  test("E1 streaming: gap-based session windows") {
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val sessions = Detectors.sessionize(events, gap = "30 minutes")
    val q = sessions.writeStream.format("memory").queryName("e1_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
      // user 1: two events 10 min apart (one session), then one event
      // 2 hours later (second session)
      input.addData((ts(0), 1L), (ts(600), 1L), (ts(7800), 1L))
      q.processAllAvailable()
      val rows = spark.table("e1_stream")
        .select("user_id", "n_events").as[(Long, Long)].collect().sorted
      assert(rows.toSeq == Seq((1L, 1L), (1L, 2L)))
    } finally q.stop()
  }
}
