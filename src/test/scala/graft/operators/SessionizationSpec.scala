package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Parameter generality of the sessions/funnels/attribution library
  * surface beyond the catalog defaults the oracles pin (e1/e1b 30-min
  * gap, e5/e5b click→view→purchase, e10/e10b click→purchase):
  * arbitrary column names, gaps, bucket widths, stage chains, and the
  * bucketSeconds > gapSeconds guard. */
class SessionizationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._
  import Sessionization.EventCols

  private val cols = EventCols(user = "visitor", id = "eid", tpe = "kind",
    ts = "at")

  private def ev(rows: (Long, Long, String, Long)*) = {
    import spark.implicits._
    // (visitor, epochSec, kind, eid)
    rows.toDF("visitor", "sec", "kind", "eid")
      .select(col("visitor"), expr("timestamp_seconds(sec)").as("at"),
        col("kind"), col("eid"))
  }

  test("sessionize honors custom columns and gap") {
    val d = ev((1L, 0L, "x", 1L), (1L, 50L, "x", 2L), (1L, 200L, "x", 3L),
      (2L, 0L, "x", 4L))
    val out = Sessionization.sessionize(d, gapSeconds = 100L, cols)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // user 1: events at 0,50 in session 1; 200 starts session 2
    assert(out == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("sessionizeBucketed == sessionize at a non-default gap/bucket") {
    val d = ev((1L, 0L, "x", 1L), (1L, 99L, "x", 2L), (1L, 199L, "x", 3L),
      (1L, 500L, "x", 4L), (1L, 650L, "x", 5L), (2L, 120L, "x", 6L))
    val plain = Sessionization.sessionize(d, 100L, cols).collect().toSeq
    val bucketed = Sessionization
      .sessionizeBucketed(d, 100L, bucketSeconds = 250L, cols)
      .collect().toSeq
    assert(bucketed == plain)
  }

  test("sessionizeBucketed rejects bucketSeconds <= gapSeconds") {
    val d = ev((1L, 0L, "x", 1L))
    intercept[IllegalArgumentException] {
      Sessionization.sessionizeBucketed(d, 1800L, bucketSeconds = 1800L, cols)
    }
  }

  test("funnel supports 1- and 2-stage chains with custom labels") {
    val d = ev((1L, 0L, "a", 1L), (1L, 10L, "b", 2L),
      (2L, 0L, "b", 3L), (2L, 10L, "a", 4L), (3L, 5L, "z", 5L))
    val two = Sessionization.funnel(d,
      stages = Seq("a" -> "s1", "b" -> "s2"), activeLabel = "all", cols)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // user 1 completes a→b; user 2 has b before a (no); user 3 neither
    assert(two == Map("all" -> 3L, "s1" -> 2L, "s2" -> 1L))
    val one = Sessionization.funnel(d,
      stages = Seq("b" -> "s1"), activeLabel = "all", cols)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == Map("all" -> 3L, "s1" -> 2L))
  }

  test("funnel rejects duplicate stage types") {
    val d = ev((1L, 0L, "a", 1L))
    intercept[IllegalArgumentException] {
      Sessionization.funnel(d, Seq("a" -> "s1", "a" -> "s2"), "all", cols)
    }
  }

  test("lastTouch attributes custom source/conversion types and lookback") {
    val d = ev((1L, 0L, "ad", 1L), (1L, 30L, "install", 2L),
      (1L, 500L, "install", 3L), (2L, 10L, "install", 4L))
    val out = Sessionization
      .lastTouch(d, sourceType = "ad", conversionType = "install",
        lookbackSeconds = 100L, cols)
      .collect().map(r => (r.getLong(0),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    // eid 2 attributes to ad 1; eid 3 outside the 100 s lookback; eid 4
    // has no source at all
    assert(out == Map(2L -> Some(1L), 3L -> None, 4L -> None))
    val b = Sessionization.lastTouchBucketed(d, "ad", "install", 100L,
      bucketSeconds = 60L, cols)
      .collect().map(r => (r.getLong(0),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(b == out)
  }
}
