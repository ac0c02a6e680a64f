package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide smoke + plan-shape assertions at sf0.001. The DuckDB
  * value-level oracle runs driver-side (tools/check.py); this spec keeps
  * the structural contract under `sbt test`. */
class CatalogSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  test("catalog names are unique and every oracle key exists") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }

  test("flagship entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  Catalog.all.foreach { q =>
    test(s"${q.name}: runs at sf0.001 and returns rows") {
      val n = q.fn(spark, sfDir).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("q5 star join broadcasts every dimension (single shuffle contract)") {
    val plan = Catalog.byName("q5_supplier_volume").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$plan")
  }

  test("q1 pushes the shipdate filter to the parquet scan") {
    val plan = Catalog.byName("q1_pricing_summary").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"shipdate filter not pushed:\n$plan")
  }

  test("whole-stage codegen covers the q1 aggregation path") {
    // Under AQE the codegen stages only appear in the final plan, after
    // execution ("*(n)" prefixes in the plan string).
    val df = Catalog.byName("q1_pricing_summary").fn(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"),
      s"no codegen span:\n$plan")
    // partial (map-side) aggregation must precede the shuffle
    assert(plan.contains("partial_sum"), s"no map-side partial agg:\n$plan")
  }
}
