package graft.queries

import graft.sources.Records
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators the built-in relational surface lacks: as-of
 * join and band (range) join. Both are implemented the way a distributed
 * engine should run them at 100 TB — a single hash shuffle on a selective
 * equi-key with the temporal predicate resolved inside the partition —
 * never as a cross product the optimizer must repair.
 *
 * Reference analog: the reference correlates per-partition offset/time
 * streams when validating replication progress (e.g. matching a source
 * record's latest committed offset at a checkpoint time,
 * uReplicator-Controller/src/main/java/com/uber/stream/kafka/mirrormaker/
 * controller/validation/ValidationManager.java:155-225); the as-of/band
 * shapes generalize that "latest state at time t" / "events near time t"
 * lookup to arbitrary keyed streams.
 */
object JoinQueries {

  // J1 — AS-OF JOIN: for each `purchase` event, the latest view (value,
  // id) by the same user at-or-before the purchase time. The classic
  // implementations are a per-left-row correlated subquery (quadratic)
  // or an interval cross join then rank (shuffle-explosive). The
  // distributed-merge form used here is neither: union both sides,
  // ONE hash shuffle on the key, and a per-key ordered window that
  // carries the last right-side struct forward (`last(..., ignoreNulls)`
  // over rows-unbounded-preceding — Spark computes it in a single
  // ordered pass, no re-scan per row). Cost is one shuffle + one sort of
  // |L|+|R| — the same shape a sort-merge as-of join in DuckDB/kdb runs,
  // and it survives 100 TB because state per key is ONE struct, not a
  // buffered window. At equal timestamps the right side sorts first
  // (side 0 < side 1), making the join inclusive; right-side timestamp
  // collisions are pre-collapsed by greatest-event-id so the carry is
  // deterministic. A single pathological hot key serializes within its
  // partition (window is sequential per key) — j1b below is the
  // range-bucketed variant for that case: same semantics, carry window
  // keyed on (user_id, time bucket), oracle-checked equivalent.
  private val j1 = QueryDef(
    "j1_asof_join",
    (s, dir) => {
      val ev = Records.table(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("us"))
        .agg(max("event_id").as("view_id"),
          expr("max_by(value, event_id)").as("view_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"))
      graft.operators.TemporalJoins
        .asofJoin(purchases, views, Seq("user_id"), "us")
        .select(col("user_id").cast("long").as("user_id"),
          col("event_id").cast("long").as("event_id"),
          col("view_id").cast("long").as("view_id"),
          expr("(us - us_asof) div 1000000").as("lag_s"),
          round(col("view_value"), 2).as("view_value"))
        .orderBy("event_id")
    },
    Some(
      """WITH v AS (SELECT user_id, epoch_us(ts) AS us,
        |        MAX(event_id) AS view_id, ARG_MAX(value, event_id) AS view_value
        |      FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT user_id, event_id, epoch_us(ts) AS us
        |      FROM events WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT user_id, us, 0 AS side, CAST(NULL AS BIGINT) AS event_id FROM v
        |  UNION ALL
        |  SELECT user_id, us, 1, event_id FROM p),
        |m AS (
        |  SELECT *, MAX(CASE WHEN side = 0 THEN us END) OVER
        |    (PARTITION BY user_id ORDER BY us, side ROWS UNBOUNDED PRECEDING)
        |    AS asof_us
        |  FROM u)
        |SELECT CAST(m.user_id AS BIGINT) AS user_id, m.event_id, v.view_id,
        |  CAST((m.us - m.asof_us) // 1000000 AS BIGINT) AS lag_s,
        |  ROUND(v.view_value, 2) AS view_value
        |FROM m JOIN v ON m.user_id = v.user_id AND m.asof_us = v.us
        |WHERE m.side = 1
        |ORDER BY m.event_id""".stripMargin))

  // J1B — the HOT-KEY-SAFE as-of join: identical semantics (and oracle)
  // to j1, but through [[TemporalJoins.asofJoinBucketed]] — the carry
  // window partitions on (user_id, 6-hour bucket) instead of bare
  // user_id, so ONE pathological user (a bot with the whole day's
  // events) spreads over its time buckets instead of serializing into a
  // single task; a tiny per-bucket summary restores the cross-bucket
  // carry. This is the fix j1's own scale note names for the hot-key
  // case; both forms stay gated so the equivalence is oracle-checked,
  // and the skew bench (SkewBenchSpec / BENCH_sf1 skew points) measures
  // the parallelism claim on a Zipf fixture.
  private val j1b = QueryDef(
    "j1b_asof_bucketed",
    (s, dir) => {
      val ev = Records.table(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("us"))
        .agg(max("event_id").as("view_id"),
          expr("max_by(value, event_id)").as("view_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"))
      graft.operators.TemporalJoins
        .asofJoinBucketed(purchases, views, Seq("user_id"), "us",
          bucketUs = 6L * 3600 * 1000000)
        .select(col("user_id").cast("long").as("user_id"),
          col("event_id").cast("long").as("event_id"),
          col("view_id").cast("long").as("view_id"),
          expr("(us - us_asof) div 1000000").as("lag_s"),
          round(col("view_value"), 2).as("view_value"))
        .orderBy("event_id")
    },
    Some(
      """WITH v AS (SELECT user_id, epoch_us(ts) AS us,
        |        MAX(event_id) AS view_id, ARG_MAX(value, event_id) AS view_value
        |      FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT user_id, event_id, epoch_us(ts) AS us
        |      FROM events WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT user_id, us, 0 AS side, CAST(NULL AS BIGINT) AS event_id FROM v
        |  UNION ALL
        |  SELECT user_id, us, 1, event_id FROM p),
        |m AS (
        |  SELECT *, MAX(CASE WHEN side = 0 THEN us END) OVER
        |    (PARTITION BY user_id ORDER BY us, side ROWS UNBOUNDED PRECEDING)
        |    AS asof_us
        |  FROM u)
        |SELECT CAST(m.user_id AS BIGINT) AS user_id, m.event_id, v.view_id,
        |  CAST((m.us - m.asof_us) // 1000000 AS BIGINT) AS lag_s,
        |  ROUND(v.view_value, 2) AS view_value
        |FROM m JOIN v ON m.user_id = v.user_id AND m.asof_us = v.us
        |WHERE m.side = 1
        |ORDER BY m.event_id""".stripMargin))

  // J2 — BAND (RANGE) JOIN: count same-type cross-user event pairs whose
  // timestamps fall within 60 s of each other. A naive |ts_a - ts_b| <=
  // 60s predicate plans a BroadcastNestedLoop/cartesian — O(n²) and dead
  // at scale. The band trick: quantize time into buckets of width B =
  // hi − lo (the FULL band width, 2C for a symmetric ±C band); the
  // qualifying interval [us−C, us+C] has length exactly B, so it spans
  // at most two width-B buckets — the ones holding its endpoints. Probe
  // rows therefore fan out to array_distinct({(us−C) div B, (us+C) div
  // B}) — ≤2 buckets, NOT data-dependent — and the join becomes a plain
  // equi-join on (event_type, bucket): one hash shuffle, candidate set
  // bounded by per-bucket density, exact band re-checked after the join.
  // (This is the ≤2-bucket scheme BandJoinRewrite proves sound; the
  // earlier hand-built form used 3 buckets of width C — same semantics,
  // 50% more probe-side shuffle volume.) Each qualifying pair matches
  // exactly once (the build row sits in exactly one bucket; the
  // deduplicated probe visits it once), so no dedup pass is needed.
  // This is the both-sides-big range join; when one side is small the
  // same code degenerates to a broadcast + filter.
  private val j2 = QueryDef(
    "j2_band_join",
    (s, dir) => {
      val e = Records.table(s, dir, "events")
        .select(col("event_type"), col("user_id"),
          unix_micros(col("ts")).as("us"))
      val bandUs = 60000000L
      val widthUs = 2L * bandUs // hi − lo
      // exact FLOOR division — the idiom BandJoinRewrite proves sound.
      // Bare `div` (IntegralDivide) truncates toward zero; used
      // CONSISTENTLY on both sides it happens to stay sound even for
      // negative (pre-1970) values (trunc buckets all have width >= B,
      // so a length-B window still spans <= 2 of them — brute-force
      // checked), but that argument is subtle and one mixed-idiom edit
      // away from a silent false-negative. Floor keeps j2 uniform with
      // BandJoinRewrite/asofJoinBucketed, where floor-vs-trunc IS
      // load-bearing.
      def floorDiv(v: String): org.apache.spark.sql.Column =
        expr(s"(($v) - pmod(($v), $widthUs)) div $widthUs")
      val build = e.withColumn("bucket", floorDiv("us"))
      val probe = e.withColumn("bucket",
        explode(array_distinct(array(
          floorDiv(s"us - $bandUs"),
          floorDiv(s"us + $bandUs")))))
      probe.as("a").join(build.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.bucket") === col("b.bucket"))
        .filter(abs(col("b.us") - col("a.us")) <= bandUs &&
          col("a.user_id") < col("b.user_id"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("event_type")
    },
    Some(
      """WITH e AS (SELECT event_type, user_id, epoch_us(ts) AS us FROM events)
        |SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM e a JOIN e b ON a.event_type = b.event_type
        |  AND b.us BETWEEN a.us - 60000000 AND a.us + 60000000
        |  AND a.user_id < b.user_id
        |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin))

  // J3 — the AUTO-rewritten band join: the same class of query as j2 but
  // written the way a user naturally writes it — `abs(ts_a - ts_b) <= 5 s`
  // with NO hand-built buckets and no equi key (cross-type, cross-user
  // co-occurrence per day). Catalyst alone plans this as a
  // BroadcastNestedLoopJoin — O(n²) compare; [[graft.plans.BandJoinRewrite]]
  // (injected via GraftExtensions) rewrites it into the bucketed
  // equi-join automatically, so THIS entry gates the optimizer rule
  // end-to-end: DuckDB computes the naive semantics, Spark executes the
  // rewritten plan, and the hashes must agree. PlanShapeSpec pins that
  // the executed plan is the rewrite, not the nested loop.
  private val j3 = QueryDef(
    "j3_cooccur_auto",
    (s, dir) => {
      val e = Records.table(s, dir, "events")
        .select(unix_micros(col("ts")).as("us"), col("user_id"))
      val aSide = e.select(col("us").as("aus"), col("user_id").as("auser"))
      val bSide = e.select(col("us").as("bus"), col("user_id").as("buser"))
      aSide.join(bSide,
          abs(col("aus") - col("bus")) <= 5000000L &&
            col("auser") < col("buser"))
        .groupBy(expr("aus div 86400000000").as("day"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("day")
    },
    Some(
      """WITH e AS (SELECT epoch_us(ts) AS us, user_id FROM events)
        |SELECT CAST(a.us // 86400000000 AS BIGINT) AS day,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM e a JOIN e b ON abs(a.us - b.us) <= 5000000
        |  AND a.user_id < b.user_id
        |GROUP BY day ORDER BY day""".stripMargin))

  // J4 — INTERVAL-CONTAINMENT JOIN (point-in-interval): attribute each
  // purchase to the browsing session (gap-based interval over that
  // user's `view` events) that CONTAINS it. Completes the temporal-join
  // trio: as-of (j1), band (j2/j3), interval (j4). The naive plan is a
  // non-equi theta join (`p.ts BETWEEN s.start AND s.end`) — a nested
  // loop at scale; the generic fix explodes intervals across fixed time
  // buckets, paying fan-out proportional to interval length. Neither is
  // needed here: session intervals are DISJOINT per user, so "the
  // containing interval" ≡ "the latest interval STARTING at-or-before
  // the point, if its end reaches the point" — i.e. an as-of join on
  // the interval start plus one end-bound filter. Composing
  // [[TemporalJoins.asofJoin]] keeps the whole query at ONE extra hash
  // shuffle (union + per-user ordered carry), no explode, no bucket
  // tuning, and inherits the hot-key escape (asofJoinBucketed) if a
  // key ever concentrates. This disjoint-interval reduction is the
  // standard trick for sessionized/SCD-style intervals; only genuinely
  // OVERLAPPING interval sets need the bucket-explode form (which j2's
  // band machinery already demonstrates).
  private val j4 = QueryDef(
    "j4_interval_join",
    (s, dir) => {
      val ev = Records.table(s, dir, "events")
        .withColumn("epoch", unix_timestamp(col("ts")))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ws = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sessions = ev.filter(col("event_type") === "view")
        .withColumn("gap", col("epoch") - lag("epoch", 1).over(w))
        .withColumn("new_session",
          when(col("gap").isNull || col("gap") > 21600L, 1L).otherwise(0L))
        .withColumn("session_id", sum("new_session").over(ws))
        .groupBy("user_id", "session_id")
        .agg(min("epoch").as("epoch"), (max("epoch") + 21600L).as("session_end"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("epoch"), col("event_id"))
      graft.operators.TemporalJoins
        .asofJoin(purchases, sessions, Seq("user_id"), "epoch")
        .filter(col("epoch") <= col("session_end"))
        .select(col("user_id").cast("long").as("user_id"),
          col("event_id").cast("long").as("event_id"),
          col("session_id").cast("long").as("session_id"),
          (col("epoch") - col("epoch_asof")).cast("long").as("secs_in"))
        .orderBy("event_id")
    },
    Some(
      """WITH v AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch
        |  FROM events WHERE event_type = 'view'),
        |flagged AS (
        |  SELECT *, CASE WHEN epoch - LAG(epoch) OVER w IS NULL
        |                   OR epoch - LAG(epoch) OVER w > 21600
        |                 THEN 1 ELSE 0 END AS new_session
        |  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, session_id, MIN(epoch) AS s_start,
        |    MAX(epoch) + 21600 AS s_end
        |  FROM (SELECT user_id, epoch,
        |          SUM(new_session) OVER (PARTITION BY user_id
        |            ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |            AS session_id
        |        FROM flagged)
        |  GROUP BY user_id, session_id),
        |p AS (
        |  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch
        |  FROM events WHERE event_type = 'purchase')
        |SELECT CAST(p.user_id AS BIGINT) AS user_id, p.event_id,
        |  CAST(s.session_id AS BIGINT) AS session_id,
        |  p.epoch - s.s_start AS secs_in
        |FROM p JOIN sess s ON p.user_id = s.user_id
        |  AND p.epoch BETWEEN s.s_start AND s.s_end
        |ORDER BY p.event_id""".stripMargin))

  val defs: Seq[QueryDef] = Seq(j1, j1b, j2, j3, j4)
}
