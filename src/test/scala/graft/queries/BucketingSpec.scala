package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located join strategy for repeated big⨝big joins
  * at 100 TB (SURVEY §2 "repartition/bucketing for co-located joins"):
  * writing both fact tables bucketed by the join key lets the join run
  * with NO shuffle exchange on either side. */
class BucketingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  test("bucketed lineitem ⨝ orders joins without a shuffle exchange") {
    // force a real join instead of a broadcast at this tiny sf
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      graft.sources.Records.table(spark, sfDir, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      graft.sources.Records.table(spark, sfDir, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must read both bucketed scans directly — the only
      // allowed exchange is the one feeding the final aggregation
      val joinPart = plan.split("HashAggregate").last
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      // same result as the plain (shuffling) join
      val plain = graft.sources.Records.table(spark, sfDir, "lineitem")
        .join(graft.sources.Records.table(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        plain.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
