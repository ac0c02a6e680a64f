package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Topic-set / whitelist operators F1–F6 (SURVEY.md §2.1): the reference's
 * controller-side set algebra re-expressed as relational ops.
 *
 * All inputs are small catalog DataFrames (topic → partition count). At
 * cluster scale these stay << broadcast threshold, so every join below is
 * a broadcast join — no shuffle on the catalog path.
 */
object TopicSetOps {

  /**
   * F3 — auto-whitelist candidate selection (reference
   * `controller/core/AutoTopicWhitelistingManager.java:164-203`):
   *
   *   candidates = (srcTopics ∩ dstTopics) − serving − blacklist
   *                − {t | t matches excludeRegex}
   *
   * Expressed with `intersect` / `except` / `rlike` exactly as the
   * reference's `retainAll`/`removeAll` set ops.
   */
  def autoWhitelistCandidates(
      srcTopics: DataFrame,     // (topic)
      dstTopics: DataFrame,     // (topic)
      servingTopics: DataFrame, // (topic)
      blacklist: DataFrame,     // (topic)
      excludeRegex: String): DataFrame =
    srcTopics.select("topic")
      .intersect(dstTopics.select("topic"))
      .except(servingTopics.select("topic"))
      .except(blacklist.select("topic"))
      .filter(!col("topic").rlike(excludeRegex))

  /** F4 — regex topic exclusion (reference
    * `controller/core/AutoTopicWhitelistingManager.java:180-183`; default
    * pattern excludes `__consumer_offsets`). */
  def excludeByRegex(topics: DataFrame, pattern: String): DataFrame =
    topics.filter(!col("topic").rlike(pattern))

  /** F5 — per-(topic,partition) blacklist as a broadcast anti-join
    * (reference `controller/core/HelixMirrorMakerManager.java:234-291`,
    * skipped during rebalance at
    * `AutoRebalanceLiveInstanceChangeListener.java:487-490`). */
  def applyPartitionBlacklist(records: DataFrame, blacklist: DataFrame): DataFrame =
    records.join(
      broadcast(blacklist.select(
        col("topic").as("bl_topic"), col("partition").as("bl_partition"))),
      records("topic") === col("bl_topic") &&
        records("partition") === col("bl_partition"),
      "left_anti")

  /** F2 — topic blacklist filter (anti-join form). */
  def applyTopicBlacklist(records: DataFrame, blacklist: DataFrame): DataFrame =
    records.join(broadcast(blacklist.select(col("topic").as("bl_topic"))),
      records("topic") === col("bl_topic"), "left_anti")

  /**
   * F6 — topic expansion detection (reference
   * `controller/core/HelixMirrorMakerManager.java:220-232`): topics whose
   * observed partition count grew beyond the serving assignment's count.
   * Returns (topic, served_partitions, observed_partitions).
   */
  def detectExpandedTopics(
      serving: DataFrame,  // (topic, partition_count)
      observed: DataFrame  // (topic, partition_count)
  ): DataFrame = {
    val s = serving.select(col("topic"), col("partition_count").as("served_partitions"))
    val o = observed.select(col("topic").as("o_topic"),
      col("partition_count").as("observed_partitions"))
    s.join(broadcast(o), s("topic") === o("o_topic"), "inner")
      .filter(col("observed_partitions") > col("served_partitions"))
      .select("topic", "served_partitions", "observed_partitions")
  }

  /** F3's partition-mismatch arm: topics present on both sides whose src
    * and dst partition counts disagree (reference
    * `AutoTopicWhitelistingManager.java:189-199`). */
  def partitionMismatchedTopics(
      src: DataFrame, // (topic, partition_count)
      dst: DataFrame  // (topic, partition_count)
  ): DataFrame = {
    val s = src.select(col("topic"), col("partition_count").as("src_partitions"))
    val d = dst.select(col("topic").as("d_topic"), col("partition_count").as("dst_partitions"))
    s.join(broadcast(d), s("topic") === d("d_topic"), "inner")
      .filter(col("src_partitions") =!= col("dst_partitions"))
      .select("topic", "src_partitions", "dst_partitions")
  }
}
