package graft.streaming

import graft.model.PipelineSpec
import graft.operators.{TopicSetOps, Transforms}
import graft.sources.Records
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/**
 * The reference's steady-state record path (SURVEY.md §3.1,
 * `worker/ConsumerFetcherThread.java:92-154` → `worker/ProducerThread.java:127-169`
 * → `worker/DefaultProducer.java:82-101`) as ONE Structured Streaming query:
 *
 * {{{
 *   source (kafka | files) → transform chain (T1–T5, F2/F5) → sink
 * }}}
 *
 * The flush-then-commit epoch protocol (reference K2/K3,
 * `worker/ZookeeperCheckpointManager.java:73-130`) is Spark's per-micro-batch
 * checkpoint commit: sink write, then offset-log commit — the same
 * at-least-once contract, with exactly-once on file sinks.
 *
 * Scale: the transform chain is pure column expressions (whole-stage
 * codegen); blacklists are broadcast anti-joins; rate limiting is
 * `maxOffsetsPerTrigger` (reference R1, `worker/FetcherManager.java:101-123`).
 * Parallelism comes from source partitions — no driver-side loops.
 */
object ReplicationPipeline {

  /** Apply the full record pipeline of `spec` to a record-schema DataFrame.
    * Works identically on batch and streaming frames (no stream-invalid
    * ops: all transforms are stateless projections/filters). */
  def transform(records: DataFrame, spec: PipelineSpec): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    // S5 — bounded consumption: partitions with a configured OffsetRange
    // keep only offset ∈ [start, end); partitions without one pass through
    // unbounded (reference `worker/PartitionOffsetInfo.java:29-78`, range
    // completion `worker/FetcherManager.java:292-297`). Ranges are small
    // driver-side config, so the predicate is a literal OR-chain that
    // Catalyst folds into the scan.
    val afterRanges =
      if (spec.offsetRanges.isEmpty) records
      else {
        val inAnyRange = spec.offsetRanges.map { r =>
          col("topic") === r.topic && col("partition") === r.partition
        }.reduce(_ || _)
        val allowed = spec.offsetRanges.map { r =>
          col("topic") === r.topic && col("partition") === r.partition &&
            col("offset") >= r.startingOffset &&
            r.endingOffset.fold(lit(true))(e => col("offset") < e)
        }.reduce(_ || _)
        records.filter(!inAnyRange || allowed)
      }
    val afterTopicFilter = spec.excludeTopicRegex
      .fold(afterRanges)(p => afterRanges.filter(!col("topic").rlike(p)))
    val afterBlacklists = {
      val tb =
        if (spec.topicBlacklist.isEmpty) afterTopicFilter
        else TopicSetOps.applyTopicBlacklist(
          afterTopicFilter, spec.topicBlacklist.toSeq.toDF("topic"))
      if (spec.partitionBlacklist.isEmpty) tb
      else TopicSetOps.applyPartitionBlacklist(
        tb, spec.partitionBlacklist.toSeq.toDF("topic", "partition"))
    }
    val whitelisted =
      if (spec.topics.isEmpty) afterBlacklists
      else afterBlacklists.filter(col("topic").isin(spec.topics: _*))
    Transforms.defaultChain(whitelisted, spec)
  }

  /** Streaming source over a parquet file directory with the record schema —
    * the test-harness stand-in for the Kafka source (same schema, same
    * per-partition ordering guarantees within a micro-batch). */
  def fileSource(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val base = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(base)(n => base.option("maxFilesPerTrigger", n))
      .parquet(dir)
  }

  /** Kafka streaming source for `spec` (reference S1). */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
      spec: PipelineSpec): DataFrame = {
    val assignOrSubscribe = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", spec.topics.mkString(","))
      .option("startingOffsets", "earliest")
      .option("includeHeaders", "true")
    spec.maxOffsetsPerTrigger
      .fold(assignOrSubscribe)(n => assignOrSubscribe.option("maxOffsetsPerTrigger", n.toString))
      .load()
  }

  /** Wire the transformed stream to a parquet sink with the pipeline's
    * checkpoint. `availableNow` processes the current backlog then stops —
    * the shape used by bounded replication (reference S5) and tests. */
  def parquetSink(transformed: DataFrame, outDir: String,
      checkpointDir: String, availableNow: Boolean = true): DataStreamWriter[Row] = {
    val w = transformed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
    if (availableNow) w.trigger(Trigger.AvailableNow()) else w
  }

  /** Kafka sink with the reference's durability defaults
    * (`worker/ProducerThread.java:84-88`: acks=all, in-flight=1 preserves
    * per-partition order). */
  def kafkaSink(transformed: DataFrame, bootstrapServers: String,
      checkpointDir: String): DataStreamWriter[Row] =
    transformed
      .select(col("key"), col("value"), col("topic"), col("partition"), col("headers"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("kafka.acks", "all")
      .option("kafka.max.in.flight.requests.per.connection", "1")
      .option("includeHeaders", "true")
      .option("checkpointLocation", checkpointDir)

  /** End-to-end file-based pipeline: srcDir (record-schema parquet) →
    * transforms → outDir, exactly-once via checkpoint. Returns the started
    * query. */
  def startFilePipeline(spark: SparkSession, spec: PipelineSpec,
      srcDir: String, outDir: String): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    val src = fileSource(spark, srcDir, schema)
    val ckpt = spec.checkpointLocation
      .getOrElse(s"$outDir/_checkpoint_${spec.name}")
    parquetSink(transform(src, spec), outDir, ckpt).start()
  }
}
