package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The memory-vs-RocksDB state backend tradeoff (SURVEY §2.1.1): d7/d8
  * run RocksDB in the gate because dedup state is data-sized; e3 and the
  * detectors keep the heap-backed default because their state is
  * bounded. This spec proves the BOUNDED-state operators are also green
  * under RocksDB — backend choice is sizing, not compatibility — so a
  * deployment can flip the provider per pipeline without semantic risk.
  */
class StateBackendSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  /** Session clone with the RocksDB provider (and a narrow shuffle, one
    * store per shuffle partition). */
  private def rocksSession() = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.queries.StreamingQueries.RocksDbProvider)
    ss
  }

  test("A2 flatMapGroupsWithState detector is green under RocksDB") {
    val ss = rocksSession()
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val input = MemoryStream[OffsetSnapshot]
    val out = Detectors.noProgress(input.toDS(), stuckAfterSeconds = 600)
    val q = out.writeStream.format("memory").queryName("rocks_a2")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        OffsetSnapshot("t", 0, 0L, 10L, 20L),
        OffsetSnapshot("t", 1, 0L, 10L, 20L))
      q.processAllAvailable()
      input.addData(
        OffsetSnapshot("t", 0, 700L, 20L, 30L),
        OffsetSnapshot("t", 1, 700L, 10L, 30L))
      q.processAllAvailable()
      val rows = ss.table("rocks_a2").as[StuckPartition].collect()
      assert(rows.map(r => (r.topic, r.partition)).toSeq == Seq(("t", 1)))
      // the query really ran on RocksDB stores, not the heap default:
      // the provider exports rocksdb* custom state metrics
      val metrics = q.lastProgress.stateOperators.flatMap(
        _.customMetrics.keySet.toArray.map(String.valueOf))
      assert(metrics.exists(_.startsWith("rocksdb")),
        s"expected rocksdb state metrics, got: ${metrics.mkString(",")}")
    } finally q.stop()
  }

  test("watermarked window aggregation (e3 shape) is green under RocksDB") {
    val ss = rocksSession()
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val agg = input.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("rocks_e3")
      .outputMode(OutputMode.Append()).start()
    try {
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
      input.addData((ts(0), "click"), (ts(100), "click"), (ts(200), "view"))
      q.processAllAvailable()
      // advance the watermark far enough to close the first window
      input.addData((ts(10000), "view"))
      q.processAllAvailable()
      val rows = ss.table("rocks_e3")
        .select("window_start", "event_type", "n")
        .as[(Long, String, Long)].collect().sorted
      assert(rows.toSeq == Seq((0L, "click", 2L), (0L, "view", 1L)))
    } finally q.stop()
  }
}
