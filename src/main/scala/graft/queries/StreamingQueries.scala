package graft.queries

import graft.model.{OffsetRange, PipelineSpec, Route}
import graft.sources.Records
import graft.streaming.ReplicationPipeline
import org.apache.spark.sql.functions._

/**
 * Correctness entries that exercise the STREAMING engine end-to-end —
 * the reference's actual acceptance shape (produce → replicate → consume,
 * `uReplicator-Worker/src/test/java/.../WorkerInstanceTest.java:131-159`).
 *
 * k2_replication_pipeline runs a real Structured Streaming query inside
 * the entry: the fixture-derived record table is written to a temp parquet
 * "source topic", replicated through
 * [[ReplicationPipeline.startFilePipeline]] (file source → T1/T2/T5
 * transform chain + S5 offset bounds → exactly-once file sink with
 * checkpoint), and the SINK directory is read back as the result. The
 * DuckDB oracle recomputes the same transform relationally — so the gate
 * verifies the streaming path's output, not a batch re-implementation.
 */
object StreamingQueries {

  private val k2Spec = PipelineSpec(
    name = "k2",
    route = Route("src", "dst", 0),
    topics = Seq("click", "view", "purchase"),
    topicMapping = Map("click" -> "click_stream"),
    dstPartitionCounts =
      Map("click_stream" -> 4, "view" -> 2, "purchase" -> 3),
    excludeTopicRegex = Some("^__.*"),
    // S5 bounded range: view/0 only replicates offsets >= 2
    offsetRanges = Seq(OffsetRange("view", 0, 2L, Some(1000000L))))

  private val k2 = QueryDef(
    "k2_replication_pipeline",
    (s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_k2_").toString
      val srcDir = s"$base/src"
      val outDir = s"$base/out"
      Records.recordsFromEvents(Records.table(s, dir, "events"))
        .write.mode("overwrite").parquet(srcDir)
      val spec = k2Spec.copy(checkpointLocation = Some(s"$base/ckpt"))
      val q = ReplicationPipeline.startFilePipeline(s, spec, srcDir, outDir)
      q.awaitTermination()
      s.read.parquet(outDir)
        .select(col("event_id").cast("long").as("event_id"),
          col("topic"),
          col("partition").cast("long").as("dst_partition"),
          col("offset"))
        .orderBy("event_id")
    },
    Some(s"WITH ${Records.recordsSqlCte}\n" +
      """SELECT CAST(event_id AS BIGINT) AS event_id,
        |  CASE topic WHEN 'click' THEN 'click_stream' ELSE topic END AS topic,
        |  CAST(CASE topic WHEN 'click' THEN partition % 4
        |                  WHEN 'view' THEN partition % 2
        |                  WHEN 'purchase' THEN partition % 3
        |                  ELSE NULL END AS BIGINT) AS dst_partition,
        |  CAST("offset" AS BIGINT) AS "offset"
        |FROM records
        |WHERE topic IN ('click', 'view', 'purchase')
        |  AND NOT (topic = 'view' AND partition = 0 AND "offset" < 2)
        |ORDER BY event_id""".stripMargin))

  val defs: Seq[QueryDef] = Seq(k2)
}
