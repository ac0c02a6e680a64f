package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[VecSumAgg]]: element-wise vector sum with full partial
  * aggregation — exact agreement with the posexplode formulation it
  * replaced in Clustering's centroid updates, with partials forced
  * through many partitions (update → serialize → merge), null-row
  * skipping, and the loud mixed-length failure. */
class VecSumSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("agrees with the posexplode formulation across many partitions") {
    val rnd = new scala.util.Random(11L)
    val rows = (0 until 500).map { i =>
      (i % 7, Seq.fill(16)(rnd.nextInt(2000001).toDouble))
    }
    val df = rows.toDF("g", "v").repartition(13)
    val kernel = df.groupBy("g").agg(expr("vec_sum(v)").as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toList).toMap
    val explode = df
      .select(col("g"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("g", "i").agg(sum("x").as("s"))
      .collect().groupBy(_.getInt(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toList).toMap
    assert(kernel === explode)
  }

  test("null rows are skipped; empty group never reaches eval via groupBy") {
    val df = Seq(
      (1, Option(Seq(1.0, 2.0))),
      (1, None),
      (2, Option(Seq(10.0, 20.0)))).toDF("g", "v")
    val got = df.groupBy("g").agg(expr("vec_sum(v)").as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toList).toMap
    assert(got === Map(1 -> List(1.0, 2.0), 2 -> List(10.0, 20.0)))
  }

  test("mixed vector lengths fail loudly, wrong type fails analysis") {
    val bad = Seq((1, Seq(1.0, 2.0)), (1, Seq(1.0))).toDF("g", "v")
    val e = intercept[Exception] {
      bad.groupBy("g").agg(expr("vec_sum(v)")).collect()
    }
    assert(String.valueOf(e.getMessage).contains("mixed vector lengths") ||
      String.valueOf(String.valueOf(e.getCause)).contains("mixed vector lengths"))
    val wrong = Seq((1, Seq(1, 2))).toDF("g", "v")
    val e2 = intercept[Exception] {
      wrong.groupBy("g").agg(expr("vec_sum(v)")).collect()
    }
    assert(String.valueOf(e2.getMessage).toLowerCase.contains("vec_sum"),
      e2.getMessage)
  }
}
