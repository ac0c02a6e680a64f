package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case semantics of the temporal joins (the DuckDB gate hashes the
  * fixture; this pins the boundary rules under `sbt test`): j1's as-of
  * match is inclusive at equal timestamps, drops purchases with no prior
  * view, always carries the LATEST qualifying view (greatest event_id on
  * a timestamp collision); j2's band is closed ([-60 s, +60 s]) and
  * counts each unordered cross-user pair exactly once. */
class JoinQueriesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  /** Write a crafted events table and return its dir. Columns mirror the
    * fixture schema (micros precision — the queries compare unix_micros). */
  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_jq_").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("j1: inclusive at-or-before match, latest view wins, unmatched dropped") {
    val M = 1000000L
    val dir = eventsDir(Seq(
      // user 1: view@10s, view@20s, purchase@20s (equal ts -> inclusive),
      // purchase@30s (latest view is 20s, not 10s)
      (1L, 10L * M, 1L, "view", 1.0),
      (2L, 20L * M, 1L, "view", 2.0),
      (3L, 20L * M, 1L, "purchase", 9.0),
      (4L, 30L * M, 1L, "purchase", 9.0),
      // user 2: purchase BEFORE any view -> no as-of row
      (5L, 5L * M, 2L, "purchase", 9.0),
      (6L, 50L * M, 2L, "view", 3.0),
      // user 3: two views at the SAME timestamp -> greatest event_id wins
      (7L, 10L * M, 3L, "view", 4.0),
      (8L, 10L * M, 3L, "view", 5.0),
      (9L, 11L * M, 3L, "purchase", 9.0)))
    val got = Catalog.byName("j1_asof_join").fn(spark, dir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got === Set(
      (3L, 2L, 0L, 2.0),   // equal-ts purchase matches the 20 s view
      (4L, 2L, 10L, 2.0),  // latest view (20 s), lag 10 s
      (9L, 8L, 1L, 5.0)))  // ts-collision: event_id 8 (value 5.0) wins
  }

  test("j2: band is closed at exactly 60 s; same-user and self pairs excluded") {
    val M = 1000000L
    val dir = eventsDir(Seq(
      // a/b exactly 60 s apart (IN, closed band), a/c 61 s apart (OUT)
      (1L, 0L * M, 1L, "click", 0.0),
      (2L, 60L * M, 2L, "click", 0.0),
      (3L, 61L * M, 3L, "click", 0.0),
      // same user within band -> excluded
      (4L, 10L * M, 1L, "click", 0.0),
      // different type within band -> excluded
      (5L, 20L * M, 4L, "view", 0.0)))
    val got = Catalog.byName("j2_band_join").fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // pairs: (1,2) in-band; (2,3) 1 s apart in-band; (1,3) out;
    // (4,2) 50 s in-band; (4,3) 51 s in-band; (1,4) same user excluded
    assert(got === Map("click" -> 4L))
  }

  test("j2: pre-1970 (negative-us) events pair correctly across bucket edges") {
    val M = 1000000L
    // all timestamps NEGATIVE, pairs placed to straddle the width-120 s
    // bucket boundaries where floor and trunc division disagree
    val dir = eventsDir(Seq(
      (1L, -180L * M, 1L, "click", 0.0), // floor bucket -2
      (2L, -120L * M, 2L, "click", 0.0), // exactly 60 s from 1 AND 3 (IN)
      (3L, -60L * M, 3L, "click", 0.0),  // 60 s from 2 (IN), 120 s from 1 (OUT)
      (4L, -1L * M, 4L, "click", 0.0),   // 59 s from 3 (IN), 119 s from 2 (OUT)
      (5L, 30L * M, 5L, "click", 0.0)))  // 31 s from 4 (IN) — straddles epoch 0
    val got = Catalog.byName("j2_band_join").fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // in-band pairs: (1,2), (2,3), (3,4), (4,5)
    assert(got === Map("click" -> 4L))
  }

  test("j4: containment is [start, last_view + 6 h]; outside/priorless dropped") {
    val M = 1000000L
    val H6 = 21600L
    val dir = eventsDir(Seq(
      // user 1, session A: views @0s and @100s -> interval [0, 100+6h].
      // A second session starts past the 6 h gap.
      (1L, 0L * M, 1L, "view", 0.0),
      (2L, 100L * M, 1L, "view", 0.0),
      (3L, (100L + H6 + 1) * M, 1L, "view", 0.0), // session B @ 21701s
      // purchase at exact session-A start -> secs_in = 0
      (4L, 0L * M, 1L, "purchase", 9.0),
      // purchase mid-session-A
      (5L, 50L * M, 1L, "purchase", 9.0),
      // purchase in A's 6 h tail (last view 100 s + 6 h)
      (6L, (100L + H6) * M, 1L, "purchase", 9.0),
      // purchase in session B, 10 s after its start
      (7L, (100L + H6 + 11) * M, 1L, "purchase", 9.0),
      // user 2: purchase before any view -> dropped; then past the tail
      (8L, 5L * M, 2L, "purchase", 9.0),
      (9L, 10L * M, 2L, "view", 0.0),
      (10L, (10L + H6 + 1) * M, 2L, "purchase", 9.0))) // 1 s past tail
    val got = Catalog.byName("j4_interval_join").fn(spark, dir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (4L, 1L, 1L, 0L),      // at session-A start
      (5L, 1L, 1L, 50L),     // mid session A
      (6L, 1L, 1L, 100L + H6), // last second of A's tail (inclusive)
      (7L, 1L, 2L, 10L)))    // session B, 10 s in; 8 and 10 dropped
  }
}
