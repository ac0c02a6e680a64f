package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction so Verify / Bench / tests agree on the
  * configs that affect correctness and local-mode performance. */
object Sessions {
  def local(appName: String, cpus: String): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE can only COALESCE below shuffle.partitions, never widen a
      // heavy stage above it: at 32 partitions a 180M-row join+agg
      // stage runs 5.6M rows/task (measured: q21 at sf30 spends 16 s
      // per task while small stages are fine). Start wide and let AQE
      // coalesce the small stages back down — the big-stage task width
      // then tracks data volume instead of the core count. Stateful
      // streaming ignores this (state-store layout follows
      // shuffle.partitions; AQE is off in streaming), so checkpoints
      // are unaffected.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as LONG nanos and
      // convert in graft.sources.Records.table
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
