package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[TemporalJoins.asofJoin]] as a general API: multi-column keys,
  * several carried columns, the `_asof` timestamp carry, collision
  * suffixes, and inclusive/backward semantics on arbitrary frames. */
class TemporalJoinsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("multi-key as-of carries the latest right struct inclusively") {
    val quotes = Seq(
      ("NYSE", "A", 10L, 1.0, "mm1"),
      ("NYSE", "A", 20L, 2.0, "mm2"),
      ("BATS", "A", 15L, 9.0, "mm3"), // other venue — must not leak
      ("NYSE", "B", 5L, 7.0, "mm4"))
      .toDF("venue", "sym", "t", "px", "src")
    val trades = Seq(
      ("NYSE", "A", 20L, 100L), // equal ts -> inclusive match to px=2.0
      ("NYSE", "A", 25L, 200L),
      ("NYSE", "B", 4L, 300L),  // before any quote -> dropped
      ("BATS", "A", 16L, 400L))
      .toDF("venue", "sym", "t", "qty")
    val got = TemporalJoins.asofJoin(trades, quotes, Seq("venue", "sym"), "t")
      .select("venue", "sym", "t", "qty", "px", "src", "t_asof")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5), r.getLong(6))).toSet
    assert(got === Set(
      ("NYSE", "A", 20L, 100L, 2.0, "mm2", 20L),
      ("NYSE", "A", 25L, 200L, 2.0, "mm2", 20L),
      ("BATS", "A", 16L, 400L, 9.0, "mm3", 15L)))
  }

  test("suffix disambiguates carried columns that collide with the left") {
    val l = Seq((1L, 10L, "l-val")).toDF("k", "t", "v")
    val r = Seq((1L, 5L, "r-val")).toDF("k", "t", "v")
    val got = TemporalJoins.asofJoin(l, r, Seq("k"), "t", suffix = "_r")
      .select("k", "t", "v", "v_r", "t_asof").collect().head
    assert((got.getLong(0), got.getLong(1), got.getString(2),
      got.getString(3), got.getLong(4)) === (1L, 10L, "l-val", "r-val", 5L))
  }

  test("colliding carried columns without a suffix are rejected") {
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 5L, "y")).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(l, r, Seq("k"), "t")
    }
  }

  test("bucketed as-of: one hot key spreads across (key, bucket) partitions") {
    // one key owning the whole timeline — the case the bucketed form
    // exists for. Values: right at even times, left at odd; every left
    // matches the immediately preceding right, including across bucket
    // boundaries (width 10 → carry crosses every 5th pair).
    val right = (0L until 200L by 2).map(t => (1L, t, t * 10)).toDF("k", "t", "v")
    val left = (1L until 200L by 2).map(t => (1L, t)).toDF("k", "t")
    val out = TemporalJoins.asofJoinBucketed(left, right, Seq("k"), "t",
      bucketUs = 10L)
    val got = out.select("t", "v", "t_asof").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = (1L until 200L by 2).map(t => (t, (t - 1) * 10, t - 1)).toSet
    assert(got === expected)
    // the in-bucket carry window must partition on (k, bucket), not bare
    // k — that IS the parallelism claim
    val plan = out.queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.exists(l => l.contains("windowspecdefinition(k") &&
      l.contains("__bucket")),
      s"in-bucket window not keyed by (k, __bucket):\n${windowLines.mkString("\n")}")
  }

  test("bandCondition joins plan as the rewritten bucketed equi-join") {
    val a = Seq.tabulate(50)(i => (i.toLong, i.toLong * 3)).toDF("a_id", "a_t")
    val b = Seq.tabulate(50)(i => (i.toLong, i.toLong * 5)).toDF("b_id", "b_t")
    val q = a.join(b,
      TemporalJoins.bandCondition(a("a_t"), b("b_t"), -10L, 10L))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"band helper not rewritten:\n$plan")
  }
}
