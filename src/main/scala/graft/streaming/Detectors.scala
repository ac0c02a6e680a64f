package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One offset snapshot for a (topic, partition), as produced by the lag
  * monitor (reference `controller/core/OffsetMonitor.java:240-316`). */
final case class OffsetSnapshot(
    topic: String,
    partition: Int,
    snapTs: Long,
    commitOffset: Long,
    latestOffset: Long)

/** A detected no-progress observation (reference
  * `controller/core/OffsetMonitor.java:293-307`: commit offset unchanged
  * while lag > 0 for longer than the threshold). */
final case class StuckPartition(
    topic: String,
    partition: Int,
    sinceTs: Long,
    snapTs: Long,
    commitOffset: Long,
    lag: Long)

/** Detector state: the last commit offset and when it last advanced. */
final case class ProgressState(lastCommit: Long, lastAdvanceTs: Long)

/**
 * Streaming stateful detectors (SURVEY.md §2.1 A2). The batch form lives in
 * [[graft.operators.Monitoring.noProgressPartitions]]; this is the
 * continuous form over a snapshot stream, with per-key state in the
 * checkpoint — the Spark-native replacement for the reference's in-memory
 * `noProgressMap` (`controller/core/OffsetMonitor.java:458-474`).
 *
 * Scale: state is O(#partitions) tiny records, hash-distributed by
 * (topic, partition); snapshots shuffle once to co-locate with state.
 */
object Detectors {

  /** Flag a partition stuck when its commit offset has not advanced for at
    * least `stuckAfterSeconds` (reference default 600 s,
    * `controller/core/OffsetMonitor.java:78`) while lag > 0. Works on a
    * stream of [[OffsetSnapshot]]; emits one [[StuckPartition]] per stuck
    * observation. */
  def noProgress(
      snapshots: Dataset[OffsetSnapshot],
      stuckAfterSeconds: Long = 600): Dataset[StuckPartition] = {
    val spark = snapshots.sparkSession
    import spark.implicits._
    snapshots
      .groupByKey(s => (s.topic, s.partition))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(detectStuck(stuckAfterSeconds))
  }

  private[streaming] def detectStuck(stuckAfterSeconds: Long)(
      key: (String, Int),
      snapshots: Iterator[OffsetSnapshot],
      state: GroupState[ProgressState]): Iterator[StuckPartition] = {
    val ordered = snapshots.toSeq.sortBy(_.snapTs)
    val out = Seq.newBuilder[StuckPartition]
    var st = state.getOption
    ordered.foreach { s =>
      st match {
        case None =>
          st = Some(ProgressState(s.commitOffset, s.snapTs))
        case Some(prev) =>
          if (s.commitOffset > prev.lastCommit) {
            st = Some(ProgressState(s.commitOffset, s.snapTs))
          } else {
            val stuckFor = s.snapTs - prev.lastAdvanceTs
            val lag = s.latestOffset - s.commitOffset
            if (stuckFor >= stuckAfterSeconds && lag > 0)
              out += StuckPartition(key._1, key._2, prev.lastAdvanceTs,
                s.snapTs, s.commitOffset, lag)
          }
      }
    }
    st.foreach(state.update)
    out.result().iterator
  }

  /**
   * Streaming workload rates (reference A3,
   * `common/core/WorkloadInfoRetriever.java:145-237`) with event-time
   * windows and a watermark for late data — the semantics the reference
   * lacks (SURVEY.md §2.2 "streaming: watermarks").
   *
   * `raw`: streaming (topic, ts, bytes, msgs).
   */
  def workloadRatesStream(raw: DataFrame, windowSeconds: Int,
      watermarkDelay: String = "10 minutes"): DataFrame =
    raw.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), s"$windowSeconds seconds"), col("topic"))
      .agg(
        (sum(col("bytes")) / lit(windowSeconds.toDouble)).as("bytes_per_sec"),
        (sum(col("msgs")) / lit(windowSeconds.toDouble)).as("msgs_per_sec"))
      .select(col("window.start").as("window_start"), col("topic"),
        col("bytes_per_sec"), col("msgs_per_sec"))

  /** Session windows over an event stream (gap-based), the streaming
    * counterpart of the batch sessionizer (PipelineQueries e1). */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
}
