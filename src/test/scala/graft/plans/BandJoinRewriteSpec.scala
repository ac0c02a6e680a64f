package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[BandJoinRewrite]]: naive band predicates plan as bucketed equi-joins
  * (no cartesian), with results IDENTICAL to the rule-off execution —
  * including negative values (floor-division sign), one-sided BETWEEN
  * bands, and strict inequalities; joins with an equi key are untouched. */
class BandJoinRewriteSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def withRuleOff[T](f: => T): T = {
    spark.conf.set("spark.graft.bandJoinRewrite", "false")
    try f finally spark.conf.set("spark.graft.bandJoinRewrite", "true")
  }

  // values straddle zero so bucket math exercises negative floor division
  private lazy val a = Seq.tabulate(300)(i => (i.toLong, i.toLong * 7 - 1000))
    .toDF("a_id", "a_v")
  private lazy val b = Seq.tabulate(300)(i => (i.toLong, i.toLong * 11 - 1500))
    .toDF("b_id", "b_v")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("abs band: no cartesian, identical to rule-off execution") {
    def q = a.join(b, abs(col("a_v") - col("b_v")) <= 25)
    val plan = planOf(q)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"band join not rewritten:\n$plan")
    assert(plan.contains("__graft_band"), s"rewrite markers missing:\n$plan")
    val expected = withRuleOff { pairs(q) }
    assert(expected.nonEmpty && pairs(q) === expected)
  }

  test("one-sided BETWEEN band rewrites and matches") {
    def q = a.join(b,
      col("b_v") >= col("a_v") - 100 && col("b_v") <= col("a_v") + 30)
    val plan = planOf(q)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"BETWEEN band not rewritten:\n$plan")
    val expected = withRuleOff { pairs(q) }
    assert(expected.nonEmpty && pairs(q) === expected)
  }

  test("strict bounds rewrite and keep exact strictness") {
    def q = a.join(b, col("b_v") > col("a_v") && col("b_v") < col("a_v") + 22)
    val plan = planOf(q)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"strict band not rewritten:\n$plan")
    val expected = withRuleOff { pairs(q) }
    assert(expected.nonEmpty && pairs(q) === expected)
  }

  test("band stated via spark.sql gets the rewrite too") {
    a.createOrReplaceTempView("band_a")
    b.createOrReplaceTempView("band_b")
    def q = spark.sql(
      "SELECT a_id, b_id FROM band_a JOIN band_b ON abs(a_v - b_v) <= 25")
    val plan = planOf(q)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"SQL band join not rewritten:\n$plan")
    assert(pairs(q.select(col("a_id"), col("b_id"))) ===
      pairs(a.join(b, abs(col("a_v") - col("b_v")) <= 25)))
  }

  test("crossJoin().filter(band) — pushed into a Cross join — rewrites too") {
    def q = a.crossJoin(b).filter(abs(col("a_v") - col("b_v")) <= 25)
    val plan = planOf(q)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"conditioned cross join not rewritten:\n$plan")
    val expected = withRuleOff { pairs(q) }
    assert(expected.nonEmpty && pairs(q) === expected)
  }

  test("with two independent bands, the narrowest one is bucketed") {
    // a_v/b_v band width 8 (narrow), a_id/b_id band width 400 (wide)
    def q = a.join(b,
      abs(col("a_v") - col("b_v")) <= 4 &&
        col("b_id") >= col("a_id") - 200 && col("b_id") <= col("a_id") + 200)
    val plan = planOf(q)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"not rewritten:\n$plan")
    assert(plan.contains("% 8") || plan.contains("pmod") && plan.contains(", 8"),
      s"bucketing did not pick the width-8 band:\n$plan")
    val expected = withRuleOff { pairs(q) }
    assert(expected.nonEmpty && pairs(q) === expected)
  }

  test("joins with an equi key are left alone") {
    val q = a.join(b, col("a_id") === col("b_id") &&
      abs(col("a_v") - col("b_v")) <= 5000)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_band"),
      s"equi-keyed join was rewritten:\n$plan")
  }

  test("pure cross joins without a band are left alone") {
    val q = a.limit(5).join(b.limit(5))
    assert(q.count() == 25L)
    assert(!q.queryExecution.executedPlan.toString.contains("__graft_band"))
  }
}
