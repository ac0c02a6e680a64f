package graft

import graft.queries.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory lives in [[graft.queries.Catalog]] (RefQueries =
  * the reference's operator inventory, RelQueries = relational coverage,
  * PipelineQueries = training-data-pipeline extensions). Each entry pairs
  * a Spark implementation with DuckDB oracle SQL over the same parquet
  * tables; column aliases match exactly on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the 6-way star join (q5 shape) — scans, broadcast joins, agg. */
  def entry(spark: SparkSession): DataFrame =
    Catalog.byName("q5_supplier_volume").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
