package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when expressible) an
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver
  * sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Catalog {
  lazy val all: Seq[QueryDef] =
    RefQueries.defs ++ RelQueries.defs ++ RelQueries2.defs ++
      PipelineQueries.defs ++ StreamingQueries.defs ++ PlannerQueries.defs ++
      JoinQueries.defs

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
