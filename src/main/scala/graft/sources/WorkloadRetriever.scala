package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * C3-style topic-workload retriever (reference
 * `common/utils/C3QueryUtils.java:45-111` + the retrieval loop in
 * `common/core/WorkloadInfoRetriever.java:239-263`): query an external
 * metrics service for per-topic `{startTimeSec, endTimeSec, totalBytes,
 * totalCount}` samples over a window and turn them into the
 * (topic, bytes_per_sec, msgs_per_sec, last_update) relation the
 * planner's sizing math consumes.
 *
 * The TRANSPORT is pluggable — `fetch(startSec, endSec, topics)` returns
 * the service's JSON body. An HTTP GET against
 * `/chaperone3/rawmetrics?startSec=..&endSec=..&topicList=..` is one
 * implementation (when a network exists); a file- or literal-backed
 * fetch serves the offline sandbox and tests. Everything downstream of
 * the fetch is Spark-native: the body is parsed with `from_json` (shaped
 * as map<topic, array<sample>>), exploded, and validated with the
 * reference's own rules (drop null fields, drop non-positive periods).
 *
 * Topics are queried in batches of [[WorkloadRetriever.BatchTopics]]
 * like the reference (bounded driver-side loop — #topics is cluster
 * metadata, not data).
 */
final class WorkloadRetriever(
    spark: SparkSession,
    fetch: (Long, Long, Seq[String]) => String) {

  import WorkloadRetriever._

  /** Retrieve one window's workload for `topics`: the reference aligns
    * the window end 600 s back from `timeSec` on a 600 s grid
    * (`C3QueryUtils.java:51-52`). */
  def retrieve(timeSec: Long, windowSec: Long, topics: Seq[String]): DataFrame = {
    import spark.implicits._
    val endSec = (timeSec - MinEndToCurrentSec) / 600 * 600
    val startSec = endSec - windowSec
    val bodies = topics.sorted.grouped(BatchTopics)
      .map(batch => fetch(startSec, endSec, batch))
      .toSeq
    val sampleSchema = "map<string, array<struct<startTimeSec: bigint, " +
      "endTimeSec: bigint, totalBytes: bigint, totalCount: bigint>>>"
    bodies.toDF("body")
      .select(explode(from_json(col("body"), sampleSchema,
        Map.empty[String, String])).as(Seq("topic", "samples")))
      // reference reads the FIRST sample per topic (getJSONObject(0));
      // try_element_at: an empty sample array means "no data", not an
      // error (mirrors `arr.size() == 0 → continue`)
      .select(col("topic"), try_element_at(col("samples"), lit(1)).as("s"))
      .filter(col("s").isNotNull)
      .filter(col("s.startTimeSec").isNotNull && col("s.endTimeSec").isNotNull &&
        col("s.totalBytes").isNotNull && col("s.totalCount").isNotNull)
      .withColumn("period",
        (col("s.endTimeSec") - col("s.startTimeSec")).cast("double"))
      .filter(col("period") > 0)
      // the service may answer with topics we did not ask for (fileFetch
      // returns its whole canned document for EVERY batch): keep only
      // the requested set, one row per topic (reference keeps the last
      // write per topic in its map)
      .filter(col("topic").isin(topics: _*))
      .dropDuplicates("topic")
      .select(col("topic"),
        (col("s.totalBytes") / col("period")).as("bytes_per_sec"),
        (col("s.totalCount") / col("period")).as("msgs_per_sec"),
        (col("s.endTimeSec") * 1000).as("last_update_ms"))
  }
}

object WorkloadRetriever {
  /** Reference batch size (`DEFAULT_BATCH_TOPICS`). */
  val BatchTopics = 100
  /** Reference end-lag from "now" (`DEFAULT_QUERY_MINIMUM_END_TO_CURRENT_SEC`). */
  val MinEndToCurrentSec = 600L

  /** A file-backed fetch for offline use: reads the whole JSON document
    * from `path` regardless of the requested range (the file IS the
    * service's canned answer). */
  def fileFetch(path: String): (Long, Long, Seq[String]) => String = {
    (_, _, _) => new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The reference's actual transport (`C3QueryUtils.java:45-66`): an
    * HTTP GET against
    * `<base>/chaperone3/rawmetrics?startSec=..&endSec=..&topicList=t1,t2`
    * returning the body on 200 and failing loudly otherwise (the
    * retrieval loop catches and retries next period, mirroring
    * `WorkloadInfoRetriever.java:251-259`). Built on `java.net.http` —
    * zero new dependencies; driver-side control plane, never data. */
  def httpFetch(baseUrl: String,
      timeout: java.time.Duration = java.time.Duration.ofSeconds(10))
      : (Long, Long, Seq[String]) => String = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(timeout).build()
    (startSec, endSec, topics) => {
      val topicList = java.net.URLEncoder.encode(topics.mkString(","), "UTF-8")
      val uri = java.net.URI.create(
        s"$baseUrl/chaperone3/rawmetrics?startSec=$startSec&endSec=$endSec" +
          s"&topicList=$topicList")
      val req = java.net.http.HttpRequest.newBuilder(uri)
        .timeout(timeout).GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        throw new java.io.IOException(
          s"workload metrics GET $uri -> HTTP ${resp.statusCode()}")
      resp.body()
    }
  }
}
