package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Monitoring aggregations A1–A7 (SURVEY.md §2.1): lag, stuck-partition
 * detection, workload rates, expected-worker sizing, validation counts and
 * view diffs.
 *
 * Scale notes:
 *  - Lag join (A1) keys on (topic, partition) — both sides are
 *    per-partition summaries (≤ millions of rows at any cluster size), so
 *    the join is a single shuffle on a pre-aggregated relation, never on
 *    raw records.
 *  - Rate windows (A3) use epoch bucketing (`floor(epoch/period)`), which
 *    is a map-side expression; the groupBy gets map-side partial
 *    aggregation for free.
 *  - No-progress detection (A2) is a window `lag()` over
 *    (topic, partition) — shuffle by key once, sort within partition.
 */
object Monitoring {

  /** A1 — per-(topic,partition) lag: `lag = latest − committed`
    * (reference `controller/core/OffsetMonitor.java:240-316`). LEFT join:
    * a partition with no committed offset at all is the maximal-lag case
    * this monitor exists to surface — it reports commit −1 rather than
    * silently disappearing from the lag report. */
  def partitionLag(latest: DataFrame, committed: DataFrame): DataFrame = {
    val l = latest.select(col("topic"), col("partition"), col("latest_offset"))
    val c = committed.select(col("topic").as("c_topic"),
      col("partition").as("c_partition"), col("commit_offset"))
    l.join(c, l("topic") === c("c_topic") && l("partition") === c("c_partition"),
        "left")
      .withColumn("commit_offset", coalesce(col("commit_offset"), lit(-1L)))
      .select(col("topic"), col("partition"), col("latest_offset"),
        col("commit_offset"),
        greatest(col("latest_offset") - col("commit_offset"), lit(0L)).as("lag"))
  }

  /**
   * A2 — no-progress (stuck) detection (reference
   * `controller/core/OffsetMonitor.java:293-307,458-474`): a partition is
   * stuck if its commit offset did not advance between consecutive
   * snapshots while lag > 0.
   *
   * `snapshots`: (topic, partition, snap_ts, commit_offset, latest_offset).
   * Returns the stuck (topic, partition, snap_ts) observations.
   */
  def noProgressPartitions(snapshots: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("topic"), col("partition")).orderBy(col("snap_ts"))
    snapshots
      .withColumn("prev_commit", lag(col("commit_offset"), 1).over(w))
      .filter(col("prev_commit").isNotNull &&
        col("commit_offset") === col("prev_commit") &&
        col("latest_offset") > col("commit_offset"))
      .select(col("topic"), col("partition"), col("snap_ts"),
        col("commit_offset"),
        (col("latest_offset") - col("commit_offset")).as("lag"))
  }

  /**
   * A3 — workload rate aggregation (reference
   * `common/utils/C3QueryUtils.java:45-111`,
   * `common/core/WorkloadInfoRetriever.java:145-237`): bytes/s and msgs/s
   * per topic over fixed windows, then max-over-lookback per topic.
   *
   * `raw`: (topic, ts, bytes, msgs). `windowSeconds` is the fine window
   * (reference default 600 s).
   */
  def workloadRates(raw: DataFrame, windowSeconds: Int): DataFrame =
    raw.groupBy(col("topic"),
        (floor(unix_timestamp(col("ts")) / windowSeconds) * windowSeconds)
          .cast("long").as("window_start"))
      .agg(
        (sum(col("bytes")) / lit(windowSeconds.toDouble)).as("bytes_per_sec"),
        (sum(col("msgs")) / lit(windowSeconds.toDouble)).as("msgs_per_sec"))

  /** A3's max-over-lookback: the max windowed rate per topic wins
    * (reference `WorkloadInfoRetriever.java:150-167`). */
  def peakWorkload(rates: DataFrame): DataFrame =
    rates.groupBy(col("topic"))
      .agg(max(col("bytes_per_sec")).as("peak_bytes_per_sec"),
        max(col("msgs_per_sec")).as("peak_msgs_per_sec"))

  /** A4 — per-instance workload sum (reference
    * `common/core/InstanceTopicPartitionHolder.java:116-132`):
    * assignment ⨝ per-partition workload → Σ per instance. */
  def instanceWorkload(assignment: DataFrame, partitionWorkload: DataFrame): DataFrame = {
    val pw = partitionWorkload.select(col("topic").as("w_topic"),
      col("partition").as("w_partition"), col("bytes_per_sec"))
    assignment
      .join(pw, assignment("topic") === col("w_topic") &&
        assignment("partition") === col("w_partition"), "left")
      .groupBy(col("instance"))
      .agg(sum(coalesce(col("bytes_per_sec"), lit(0.0))).as("total_bytes_per_sec"),
        count(lit(1)).as("num_partitions"))
  }

  /** A5 — expected-worker calculation (reference
    * `controller/rest/resources/AdminRestletResource.java:126-129`):
    * `ceil(totalBytesPerSec / maxWorkloadPerWorker) + laggingAdjustment`. */
  def expectedWorkers(totalBytesPerSec: Column, maxPerWorker: Double,
      laggingAdjustment: Column): Column =
    (ceil(totalBytesPerSec / lit(maxPerWorker)) + laggingAdjustment).cast("long")

  /** A6 — state counting per instance (reference
    * `controller/validation/ValidationManager.java:155-225`): counts of
    * each lifecycle state per instance. Emitted long-form
    * (instance, state, n) rather than pivoted so the result is
    * oracle-friendly and scale-stable. */
  def stateCounts(assignment: DataFrame): DataFrame =
    assignment.groupBy(col("instance"), col("state")).agg(count(lit(1)).as("n"))

  /** A6's mismatch arm: ideal-vs-external view mismatch = symmetric
    * difference on (instance, topic, partition, state). */
  def viewMismatch(ideal: DataFrame, external: DataFrame): DataFrame = {
    val cols = Seq("instance", "topic", "partition", "state").map(col)
    val i = ideal.select(cols: _*)
    val e = external.select(cols: _*)
    i.except(e).withColumn("only_in", lit("ideal"))
      .unionByName(e.except(i).withColumn("only_in", lit("external")))
  }

  /** A7 — manager-vs-controller diff (reference
    * `manager/core/ControllerHelixManager.java:325-393`): topics present in
    * exactly one of the two views, tagged with the side. */
  def topicViewDiff(managerView: DataFrame, controllerView: DataFrame): DataFrame = {
    val m = managerView.select("topic").distinct()
    val c = controllerView.select("topic").distinct()
    m.except(c).withColumn("only_in", lit("manager"))
      .unionByName(c.except(m).withColumn("only_in", lit("controller")))
  }
}
