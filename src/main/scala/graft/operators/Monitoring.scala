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

  /**
   * A3's full retention/lookback serving policy (reference
   * `common/core/WorkloadInfoRetriever.java:150-167,189-207`): samples
   * live in FINE (10-min) windows for the last hour and COARSE (3-h)
   * windows back to the 25-h retention horizon (the day-pattern window);
   * serving returns the workload of the max-bytes-rate window within a
   * 2-h lookback when the topic has any fresh sample, else within the
   * full retention (ties: earliest sample, matching the reference's
   * first-wins list scan).
   *
   * `raw`: (topic, ts, bytes, msgs); "now" is the max event time (the
   * retriever's refresh instant). Scale: one crossJoin with a broadcast
   * 1-row "now", one partial-aggregable groupBy on
   * (topic, granularity, window); the serving rank partitions by topic
   * over ≤ retention/fine ≈ 150 window rows per topic.
   */
  def lookbackWorkload(raw: DataFrame, fineSec: Int = 600,
      coarseSec: Int = 10800, fineHorizonSec: Long = 3600L,
      retentionSec: Long = 25L * 3600, lookbackSec: Long = 2L * 3600): DataFrame = {
    val now = raw.agg(max(unix_timestamp(col("ts"))).cast("long").as("now_s"))
    val base = raw
      .select(col("topic"), unix_timestamp(col("ts")).cast("long").as("es"),
        col("bytes"), col("msgs"))
      .crossJoin(broadcast(now))
      .filter(col("es") > col("now_s") - retentionSec)
      .withColumn("len",
        when(col("es") > col("now_s") - fineHorizonSec, fineSec.toLong)
          .otherwise(coarseSec.toLong))
    val rates = base
      .withColumn("window_start", (floor(col("es") / col("len")) * col("len")).cast("long"))
      .groupBy(col("topic"), col("len"), col("window_start"))
      .agg(first(col("now_s")).as("now_s"),
        (sum(col("bytes")) / col("len")).as("bytes_per_sec"),
        // sum, not count: rows may be pre-aggregated samples (msgs > 1),
        // the same contract workloadRates honors
        (sum(col("msgs")) / col("len")).as("msgs_per_sec"))
    val aged = rates
      .withColumn("last_update", least(col("window_start") + col("len"), col("now_s")))
      .withColumn("age", col("now_s") - col("last_update"))
    val fresh = aged.groupBy(col("topic").as("f_topic"))
      .agg((min(col("age")) < lookbackSec).as("has_fresh"))
    aged.join(broadcast(fresh), col("topic") === col("f_topic"))
      .withColumn("lookback_s",
        when(col("has_fresh"), lookbackSec).otherwise(retentionSec))
      .filter(col("age") <= col("lookback_s"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("topic")
          .orderBy(col("bytes_per_sec").desc, col("last_update"))))
      .filter(col("rn") === 1)
      .select(col("topic"), col("lookback_s").cast("long").as("lookback_s"),
        col("len").cast("long").as("granularity_s"),
        col("window_start"),
        round(col("bytes_per_sec"), 4).as("serve_bytes_per_sec"),
        round(col("msgs_per_sec"), 4).as("serve_msgs_per_sec"))
  }

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
