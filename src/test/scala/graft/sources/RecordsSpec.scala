package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Record-plane source: canonical schema, deterministic offsets, and
  * parquet pushdown (scale: predicates must reach the scan). */
class RecordsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  private def records =
    Records.recordsFromEvents(Records.table(spark, sfDir, "events"))

  test("records carry the Kafka-source schema") {
    val fields = records.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(fields("key") == "binary")
    assert(fields("value") == "binary")
    assert(fields("topic") == "string")
    assert(fields("partition") == "int")
    assert(fields("offset") == "bigint")
    assert(fields("timestamp") == "timestamp")
    assert(fields("headers").startsWith("array<struct"))
  }

  test("offsets are dense per (topic, partition) starting at 0") {
    val bad = records.groupBy("topic", "partition")
      .agg(min("offset").as("lo"), max("offset").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 0L || col("hi") =!= col("n") - 1)
      .count()
    assert(bad == 0)
  }

  test("offsets are unique per (topic, partition)") {
    val total = records.count()
    val distinct = records.select("topic", "partition", "offset").distinct().count()
    assert(total == distinct)
  }

  test("parquet scan prunes columns and pushes filters (scale contract)") {
    val df = Records.table(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") === 1L)
      .select("l_orderkey", "l_quantity")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,1)]"),
      s"filter not pushed:\n$physical")
    // ReadSchema must not include unprojected columns like l_comment
    assert(!physical.contains("l_comment"), s"column pruning failed:\n$physical")
  }

  test("events ts arrives as a usable timestamp (nanos → micros conversion)") {
    val r = Records.table(spark, sfDir, "events")
    assert(r.schema("ts").dataType.typeName == "timestamp")
    assert(r.filter(col("ts").isNull).count() == 0)
  }
}
