package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Record-plane sources.
 *
 * The engine's data-plane row is the Kafka-source schema (SURVEY.md §1.1;
 * reference consumes `ConsumerRecord` with opaque byte[] key/value —
 * `worker/ConsumerFetcherThread.java:142`):
 *
 * {{{
 *   key binary, value binary, topic string, partition int, offset long,
 *   timestamp timestamp, timestampType int,
 *   headers array<struct<key string, value binary>>
 * }}}
 *
 * Two bindings produce that schema:
 *  - [[kafkaStream]] / [[kafkaBatch]]: the real Kafka source (requires the
 *    spark-sql-kafka connector on the classpath at runtime).
 *  - [[recordsFromEvents]]: a deterministic derivation from the `events`
 *    test table, used by the batch/oracle surface so every operator runs
 *    identically on fixtures and on streams.
 *
 * Scale note: at 100 TB the parquet path relies on Catalyst pushdown —
 * callers filter on `topic`/`partition`/`offset` and those predicates
 * reach the scan (verified via `.explain` in RecordsSpec). The Kafka path
 * parallelism is `minPartitions`; no driver-side iteration anywhere.
 */
object Records {

  /** Columns of the canonical record relation. */
  val columns: Seq[String] =
    Seq("key", "value", "topic", "partition", "offset", "timestamp",
      "timestampType", "headers")

  /** Continuous scan of assigned partitions (reference S1,
    * `worker/ConsumerFetcherThread.java:92-154`). `assignJson` is the Kafka
    * source `assign` JSON, e.g. `{"topicA":[0,1]}`. */
  def kafkaStream(
      spark: SparkSession,
      bootstrapServers: String,
      assignJson: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val base = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("assign", assignJson)
      .option("startingOffsets", startingOffsets)
      .option("includeHeaders", "true")
    maxOffsetsPerTrigger
      .fold(base)(n => base.option("maxOffsetsPerTrigger", n.toString))
      .load()
  }

  /** Bounded scan `[startingOffsets, endingOffsets)` (reference S5,
    * `worker/PartitionOffsetInfo.java:29-78`): a batch Kafka read. */
  def kafkaBatch(
      spark: SparkSession,
      bootstrapServers: String,
      assignJson: String,
      startingOffsets: String,
      endingOffsets: String): DataFrame =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("assign", assignJson)
      .option("startingOffsets", startingOffsets)
      .option("endingOffsets", endingOffsets)
      .option("includeHeaders", "true")
      .load()

  /** Normalize an `events.ts` column to session-local TIMESTAMP whatever
    * the fixture generation wrote:
    *  - TIMESTAMP(NANOS) + `nanosAsLong=true` → LONG nanos → truncate to
    *    micros (the same truncation DuckDB applies);
    *  - TIMESTAMP(MICROS) without UTC adjustment → TIMESTAMP_NTZ → cast
    *    (sessions run UTC, so the naive wall-clock IS the instant DuckDB
    *    reads — values stay bit-identical to the oracle);
    *  - already TIMESTAMP → unchanged. */
  def tsToTimestamp(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column =
    dt match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(ts div 1000)")
      case org.apache.spark.sql.types.TimestampNTZType =>
        col("ts").cast("timestamp")
      case _ => col("ts")
    }

  /** Read one fixture table from an sf directory, with `events.ts`
    * normalized via [[tsToTimestamp]]. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") df.withColumn("ts", tsToTimestamp(df.schema("ts").dataType))
    else df
  }

  /**
   * Deterministic Kafka-record view over the `events` fixture table:
   * topic = event_type, partition = pmod(user_id, 8), offset = dense
   * per-(topic,partition) sequence by (ts, event_id), payload = props.
   *
   * The offset is made monotone per partition with a window row_number —
   * mirrors FIXTURES.md §3. All derivations are integer/UTF8-exact so the
   * DuckDB oracle reproduces them bit-for-bit.
   */
  def recordsFromEvents(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // project (topic, partition) FIRST and window over those actual
    // attributes — the window's output partitioning is then exactly
    // (topic, partition), so a downstream groupBy on the same columns
    // (a1's lag aggregation) reuses this exchange instead of shuffling
    // again. Windowing over the pre-projection expressions would
    // extract them into fresh internal attributes the agg can't match.
    val base = events.select(
      col("user_id").cast("string").cast("binary").as("key"),
      col("props").cast("binary").as("value"),
      col("event_type").as("topic"),
      pmod(col("user_id"), lit(8)).cast("int").as("partition"),
      col("ts").as("timestamp"),
      lit(0).as("timestampType"),
      array(struct(lit("event_id").as("key"),
        col("event_id").cast("string").cast("binary").as("value"))).as("headers"),
      // retained for oracle-side joins / derivations
      col("event_id"),
      col("value").as("event_value"))
    val w = Window.partitionBy(col("topic"), col("partition"))
      .orderBy(col("event_id"))
    base
      .withColumn("offset", (row_number().over(w) - 1).cast("long"))
      .select("key", "value", "topic", "partition", "offset", "timestamp",
        "timestampType", "headers", "event_id", "event_value")
  }

  /** SQL CTE body producing the same relation in DuckDB (keep in sync with
    * [[recordsFromEvents]]). */
  val recordsSqlCte: String =
    """records AS (
      |  SELECT
      |    CAST(user_id AS VARCHAR) AS key,
      |    props AS value,
      |    event_type AS topic,
      |    CAST(user_id % 8 AS INTEGER) AS partition,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type, user_id % 8
      |                            ORDER BY event_id) - 1 AS BIGINT) AS "offset",
      |    ts AS timestamp,
      |    event_id,
      |    value AS event_value
      |  FROM events
      |)""".stripMargin
}
