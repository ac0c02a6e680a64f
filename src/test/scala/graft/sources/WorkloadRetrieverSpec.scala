package graft.sources

import graft.SparkTestSession
import graft.operators.Monitoring
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C3-style workload retrieval: pluggable fetch → Spark-side JSON
  * parse/validation → rates → expected-worker sizing, end-to-end
  * (reference C3QueryUtils.java:45-111). */
class WorkloadRetrieverSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val body =
    """{"click":[{"startTimeSec":0,"endTimeSec":600,"totalBytes":600000,"totalCount":1200}],
      | "view":[{"startTimeSec":600,"endTimeSec":600,"totalBytes":1,"totalCount":1}],
      | "bad":[{"endTimeSec":600,"totalBytes":5,"totalCount":5}],
      | "empty":[]}""".stripMargin

  test("samples parse, invalid ones drop by the reference's rules") {
    val r = new WorkloadRetriever(spark, (_, _, _) => body)
    val out = r.retrieve(timeSec = 10000, windowSec = 600,
      Seq("click", "view", "bad", "empty"))
      .select("topic", "bytes_per_sec", "msgs_per_sec", "last_update_ms")
      .as[(String, Double, Double, Long)].collect()
    // click is the only valid sample: 600000 B / 600 s, 1200 msgs / 600 s
    assert(out.toSeq == Seq(("click", 1000.0, 2.0, 600000L)))
  }

  test("window alignment matches the reference (end 600 s back, on the grid)") {
    var seen: (Long, Long) = (0, 0)
    val r = new WorkloadRetriever(spark, (s, e, _) => { seen = (s, e); "{}" })
    r.retrieve(timeSec = 10000, windowSec = 600, Seq("t")).collect()
    // endSec = (10000 - 600) / 600 * 600 = 9000; startSec = 8400
    assert(seen == (8400L, 9000L))
  }

  test("topics are fetched in batches of 100") {
    var calls = 0
    val r = new WorkloadRetriever(spark, (_, _, ts) => {
      calls += 1
      assert(ts.size <= WorkloadRetriever.BatchTopics)
      "{}"
    })
    r.retrieve(1000, 600, (1 to 250).map(i => s"t$i")).collect()
    assert(calls == 3)
  }

  test("unrequested topics are dropped and multi-batch answers dedup per topic") {
    val r = new WorkloadRetriever(spark, (_, _, _) => body)
    // 150 topics → 2 batches, each answered with the SAME canned body:
    // click must appear once, not twice, and only requested topics stay
    val topics = "click" +: (1 to 149).map(i => s"t$i")
    val out = r.retrieve(10000, 600, topics)
      .select("topic").as[String].collect()
    assert(out.toSeq == Seq("click"))
  }

  test("file-backed fetch feeds rates into expected-worker sizing end-to-end") {
    val f = java.nio.file.Files.createTempFile("graft_c3_", ".json")
    java.nio.file.Files.writeString(f, body)
    try {
      val r = new WorkloadRetriever(spark, WorkloadRetriever.fileFetch(f.toString))
      val workloads = r.retrieve(10000, 600, Seq("click", "view", "bad"))
      // A5: ceil(total bytes/s over the route / per-worker budget) — with
      // an 800 B/s worker budget, 1000 B/s needs 2 workers
      val workers = workloads
        .agg(sum("bytes_per_sec").as("total"))
        .select(Monitoring.expectedWorkers(col("total"), 800.0, lit(0L))
          .as("expected"))
        .as[Long].head()
      assert(workers == 2L)
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("httpFetch retrieves over REAL loopback HTTP (reference transport)") {
    import graft.streaming.{AdminApi, AdminHttpServer, PipelineManager}
    // the in-process admin server doubles as the C3 metrics service: the
    // canned provider asserts the request the retriever actually sent
    @volatile var seen: (Long, Long, Seq[String]) = (0, 0, Nil)
    val srv = new AdminHttpServer(new AdminApi(new PipelineManager(spark)),
      metrics = Some((s, e, ts) => { seen = (s, e, ts); body }))
    srv.start()
    try {
      val fetch = WorkloadRetriever.httpFetch(s"http://127.0.0.1:${srv.boundPort}")
      val r = new WorkloadRetriever(spark, fetch)
      val out = r.retrieve(timeSec = 10000, windowSec = 600,
        Seq("click", "view", "bad", "empty"))
        .select("topic", "bytes_per_sec", "msgs_per_sec", "last_update_ms")
        .as[(String, Double, Double, Long)].collect()
      // same validation outcome as the direct-fetch test, now through HTTP
      assert(out.toSeq == Seq(("click", 1000.0, 2.0, 600000L)))
      // the reference's aligned window and comma-joined topicList arrived
      assert(seen == (8400L, 9000L, Seq("bad", "click", "empty", "view")))
    } finally srv.stop()
  }

  test("httpFetch fails loudly on a non-200 (retrieval loop retries next period)") {
    import graft.streaming.{AdminApi, AdminHttpServer, PipelineManager}
    val srv = new AdminHttpServer(new AdminApi(new PipelineManager(spark))) // no metrics provider → 404
    srv.start()
    try {
      val fetch = WorkloadRetriever.httpFetch(s"http://127.0.0.1:${srv.boundPort}")
      val e = intercept[java.io.IOException](fetch(0, 600, Seq("t")))
      assert(e.getMessage.contains("HTTP 404"))
    } finally srv.stop()
  }
}
