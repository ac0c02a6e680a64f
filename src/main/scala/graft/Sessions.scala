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
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as LONG nanos and
      // convert in graft.sources.Records.table
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
