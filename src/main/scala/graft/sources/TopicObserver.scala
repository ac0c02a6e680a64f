package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * B1/B2 — refreshable topic catalog observers (SURVEY.md §2.1).
 *
 * The reference keeps a ZK-watched cache of `topic → partitionCount` per
 * cluster, refreshed every 5 minutes
 * (`common/core/KafkaBrokerTopicObserver.java:73-283`) and a second one
 * feeding the partition remapper
 * (`common/core/TopicPartitionCountObserver.java:42-136`). Here the
 * catalog is a small DataFrame re-resolved by a loader on `refresh()`:
 * AdminClient-backed when a Kafka cluster exists, records- or file-backed
 * otherwise — the consumers (T2 remap, F3/F6 set ops) are loader-agnostic.
 *
 * Scale: the catalog is topic METADATA (≤ thousands of rows at any
 * cluster size) — `partitionCounts` collects it to the driver by design,
 * and joins against it broadcast.
 */
final class TopicCatalogObserver(loader: () => DataFrame) {

  @volatile private var current: DataFrame = loader()

  /** Re-resolve the catalog (reference: 5-minute ZK watch refresh). */
  def refresh(): Unit = { current = loader() }

  /** B1 — the catalog relation: (topic, num_partitions). */
  def catalog: DataFrame = current

  /** B2 — driver-side count map for literal-map remap paths. */
  def partitionCounts: Map[String, Int] =
    current.select("topic", "num_partitions").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap

  def topics: Set[String] =
    current.select("topic").collect().map(_.getString(0)).toSet
}

object TopicCatalogObserver {

  /** Observe counts from a record relation: the partition count of a
    * topic is max(partition)+1 over its records — what a broker metadata
    * listing would report for the fixture. */
  def fromRecords(load: () => DataFrame): TopicCatalogObserver =
    new TopicCatalogObserver(() =>
      load().groupBy("topic")
        .agg((max("partition") + 1).cast("int").as("num_partitions")))

  /** File-backed loader (`topic,count` CSV lines) — the stand-in for an
    * AdminClient listing when no broker is reachable. */
  def fromCsv(spark: SparkSession, path: String): TopicCatalogObserver =
    new TopicCatalogObserver(() =>
      spark.read.option("header", "false").csv(path)
        .select(col("_c0").as("topic"), col("_c1").cast("int").as("num_partitions")))
}
