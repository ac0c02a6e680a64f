package graft.queries

import graft.operators.{Monitoring, TopicSetOps, Transforms}
import graft.sources.Records
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Oracle-verified queries for the reference's own operator inventory
 * (SURVEY.md §2.1: T*, S*, F*, A*, O*, V*). Control tables (mappings,
 * catalogs, blacklists, assignments) are derived deterministically from
 * the fixture tables so the DuckDB oracle reproduces them exactly.
 *
 * Conventions for oracle parity:
 *  - integer outputs cast to BIGINT on both sides;
 *  - doubles only as a single division/round of exact integers, or
 *    rounded aggregates;
 *  - timestamps emitted as epoch seconds (BIGINT) or formatted strings;
 *  - every query ends with a deterministic ORDER BY.
 */
object RefQueries {

  /** Prefix a DuckDB query with the shared `records` CTE (kept in sync
    * with [[Records.recordsFromEvents]]). */
  private def withRecords(sql: String): String =
    s"WITH ${Records.recordsSqlCte}\n$sql"

  private def records(s: SparkSession, dir: String): DataFrame =
    Records.recordsFromEvents(Records.table(s, dir, "events"))

  // T1 — topic rename via mapping table.
  private val renameMapping = Map("click" -> "click_stream", "view" -> "page_view")

  private val t1 = QueryDef(
    "t1_topic_rename",
    (s, dir) => {
      Transforms.renameTopics(records(s, dir), renameMapping)
        .select(col("event_id").cast("long").as("event_id"), col("topic"))
        .orderBy("event_id")
    },
    Some(withRecords(
      """SELECT CAST(event_id AS BIGINT) AS event_id,
        |       CASE topic WHEN 'click' THEN 'click_stream'
        |                  WHEN 'view' THEN 'page_view'
        |                  ELSE topic END AS topic
        |FROM records ORDER BY event_id""".stripMargin)))

  // T2 — partition remap by destination partition count; unknown topic → null.
  private val dstCounts = Map("click" -> 4, "view" -> 2, "error" -> 8, "purchase" -> 3)

  private val t2 = QueryDef(
    "t2_partition_remap",
    (s, dir) => {
      Transforms.remapPartitions(records(s, dir), dstCounts)
        .select(col("event_id").cast("long").as("event_id"),
          col("topic"), col("partition").cast("long").as("dst_partition"))
        .orderBy("event_id")
    },
    Some(withRecords(
      """SELECT CAST(event_id AS BIGINT) AS event_id, topic,
        |  CAST(CASE topic WHEN 'click' THEN partition % 4
        |                  WHEN 'view' THEN partition % 2
        |                  WHEN 'error' THEN partition % 8
        |                  WHEN 'purchase' THEN partition % 3
        |                  ELSE NULL END AS BIGINT) AS dst_partition
        |FROM records ORDER BY event_id""".stripMargin)))

  // T3 — timestamp normalize: derived raw millis <= 0 → null.
  private val t3CutoffMillis = 1705276800000L // 2024-01-15T00:00:00Z

  private val t3 = QueryDef(
    "t3_ts_normalize",
    (s, dir) => {
      val raw = expr("unix_millis(`timestamp`)") - lit(t3CutoffMillis)
      Transforms.normalizeTimestamp(records(s, dir), raw)
        .select(col("event_id").cast("long").as("event_id"),
          date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss").as("ts_norm"))
        .orderBy("event_id")
    },
    Some(withRecords(
      s"""SELECT CAST(event_id AS BIGINT) AS event_id,
         |  CASE WHEN epoch_ms(timestamp) - $t3CutoffMillis <= 0 THEN NULL
         |       ELSE strftime(timestamp, '%Y-%m-%d %H:%M:%S') END AS ts_norm
         |FROM records ORDER BY event_id""".stripMargin)))

  // T5 — drop-on-null filter: a transformer nulls 'error' payloads; nulls dropped.
  private val t5 = QueryDef(
    "t5_null_filter",
    (s, dir) => {
      val nulled = records(s, dir).withColumn("value",
        when(col("topic") === "error", lit(null).cast("binary")).otherwise(col("value")))
      Transforms.dropNullValues(nulled)
        .select(col("event_id").cast("long").as("event_id"), col("topic"))
        .orderBy("event_id")
    },
    Some(withRecords(
      """SELECT CAST(event_id AS BIGINT) AS event_id, topic
        |FROM records WHERE topic <> 'error' AND value IS NOT NULL
        |ORDER BY event_id""".stripMargin)))

  // S5 — bounded offset-range scan [2, 10) per partition.
  private val s5 = QueryDef(
    "s5_bounded_scan",
    (s, dir) => {
      records(s, dir)
        .filter(col("offset") >= 2L && col("offset") < 10L)
        .groupBy("topic", "partition")
        .agg(count(lit(1)).as("n"), min("offset").as("first_offset"),
          max("offset").as("last_offset"))
        .select(col("topic"), col("partition").cast("long").as("partition"),
          col("n"), col("first_offset"), col("last_offset"))
        .orderBy("topic", "partition")
    },
    Some(withRecords(
      """SELECT topic, CAST(partition AS BIGINT) AS partition,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN("offset") AS BIGINT) AS first_offset,
        |  CAST(MAX("offset") AS BIGINT) AS last_offset
        |FROM records WHERE "offset" >= 2 AND "offset" < 10
        |GROUP BY topic, partition ORDER BY topic, partition""".stripMargin)))

  // S7 — offset dedup: re-fetched chunk (offset%5=0 re-delivered) deduped.
  private val s7 = QueryDef(
    "s7_offset_dedup",
    (s, dir) => {
      val r = records(s, dir).select("topic", "partition", "offset")
      val refetched = r.filter(col("offset") % 5 === 0)
      r.unionAll(refetched)
        .dropDuplicates("topic", "partition", "offset")
        .groupBy("topic")
        .agg(count(lit(1)).as("n"))
        .select(col("topic"), col("n"))
        .orderBy("topic")
    },
    Some(withRecords(
      """SELECT topic, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT DISTINCT topic, partition, "offset" FROM (
        |    SELECT topic, partition, "offset" FROM records
        |    UNION ALL
        |    SELECT topic, partition, "offset" FROM records WHERE "offset" % 5 = 0))
        |GROUP BY topic ORDER BY topic""".stripMargin)))

  // F3 — auto-whitelist candidates: (src ∩ dst) − serving − blacklist − regex.
  private val f3 = QueryDef(
    "f3_auto_whitelist",
    (s, dir) => {
      val nation = Records.table(s, dir, "nation")
      val src = nation.select(col("n_name").as("topic"))
      val dst = nation.filter(col("n_nationkey") % 7 =!= 0).select(col("n_name").as("topic"))
      val serving = nation.filter(col("n_nationkey") % 5 === 0).select(col("n_name").as("topic"))
      val blacklist = nation.filter(col("n_nationkey").isin(3, 14)).select(col("n_name").as("topic"))
      TopicSetOps.autoWhitelistCandidates(src, dst, serving, blacklist, "_1[0-9]$")
        .orderBy("topic")
    },
    Some(
      """SELECT topic FROM (
        |  SELECT n_name AS topic FROM nation
        |  INTERSECT
        |  SELECT n_name FROM nation WHERE n_nationkey % 7 <> 0
        |) EXCEPT SELECT n_name FROM nation WHERE n_nationkey % 5 = 0
        |  EXCEPT SELECT n_name FROM nation WHERE n_nationkey IN (3, 14)
        |  EXCEPT SELECT n_name FROM nation WHERE regexp_matches(n_name, '_1[0-9]$')
        |ORDER BY topic""".stripMargin))

  // F4 — regex topic exclusion (default pattern: internal __ topics).
  private val f4 = QueryDef(
    "f4_regex_exclude",
    (s, dir) => {
      import s.implicits._
      val observed = records(s, dir).select("topic").distinct()
        .unionAll(Seq("__consumer_offsets", "__transaction_state").toDF("topic"))
      TopicSetOps.excludeByRegex(observed, "^__").orderBy("topic")
    },
    Some(withRecords(
      """SELECT topic FROM (
        |  SELECT DISTINCT topic FROM records
        |  UNION ALL SELECT '__consumer_offsets'
        |  UNION ALL SELECT '__transaction_state')
        |WHERE NOT regexp_matches(topic, '^__') ORDER BY topic""".stripMargin)))

  // F5 — per-(topic,partition) blacklist anti-join (partitions >= 6 blacklisted).
  private val f5 = QueryDef(
    "f5_partition_blacklist",
    (s, dir) => {
      val r = records(s, dir)
      val blacklist = r.filter(col("partition") >= 6)
        .select("topic", "partition").distinct()
      TopicSetOps.applyPartitionBlacklist(r, blacklist)
        .groupBy("topic").agg(count(lit(1)).as("n"))
        .orderBy("topic")
    },
    Some(withRecords(
      """SELECT topic, CAST(COUNT(*) AS BIGINT) AS n
        |FROM records r WHERE NOT EXISTS (
        |  SELECT 1 FROM (SELECT DISTINCT topic, partition FROM records
        |                 WHERE partition >= 6) b
        |  WHERE b.topic = r.topic AND b.partition = r.partition)
        |GROUP BY topic ORDER BY topic""".stripMargin)))

  // F6 — topic expansion detection: observed partition count grew.
  private val f6 = QueryDef(
    "f6_topic_expansion",
    (s, dir) => {
      val nation = Records.table(s, dir, "nation")
      val serving = nation.select(col("n_name").as("topic"),
        (col("n_nationkey") % 4 + 1).cast("int").as("partition_count"))
      val observed = nation.select(col("n_name").as("topic"),
        (col("n_nationkey") % 4 + 1 +
          when(col("n_nationkey") % 3 === 0, 2).otherwise(0)).cast("int").as("partition_count"))
      TopicSetOps.detectExpandedTopics(serving, observed)
        .select(col("topic"),
          col("served_partitions").cast("long").as("served_partitions"),
          col("observed_partitions").cast("long").as("observed_partitions"))
        .orderBy("topic")
    },
    Some(
      """SELECT n_name AS topic,
        |  CAST(n_nationkey % 4 + 1 AS BIGINT) AS served_partitions,
        |  CAST(n_nationkey % 4 + 1 +
        |       CASE WHEN n_nationkey % 3 = 0 THEN 2 ELSE 0 END AS BIGINT)
        |    AS observed_partitions
        |FROM nation WHERE n_nationkey % 3 = 0 ORDER BY topic""".stripMargin))

  // A1 — per-(topic,partition) lag = latest − committed. FUSED: one scan
  // with conditional aggregation (max(offset), max(offset WHERE
  // committed)) in a single exchange — the two-feed join form scanned
  // `records` twice for the same rows. Monitoring.partitionLag keeps the
  // two-feed API (the reference's latest/committed arrive as independent
  // feeds); this query form is the fused single-source case, equivalent
  // because committed ⊆ records makes the left join a conditional max.
  private val a1 = QueryDef(
    "a1_partition_lag",
    (s, dir) => {
      val r = records(s, dir)
      r.groupBy("topic", "partition")
        .agg(max("offset").as("latest_offset"),
          coalesce(max(when(col("event_id") % 10 < 8, col("offset"))),
            lit(-1L)).as("commit_offset"))
        .withColumn("lag",
          greatest(col("latest_offset") - col("commit_offset"), lit(0L)))
        .select(col("topic"), col("partition").cast("long").as("partition"),
          col("latest_offset"), col("commit_offset"), col("lag"))
        .orderBy("topic", "partition")
    },
    Some(withRecords(
      """, latest AS (
        |  SELECT topic, partition, MAX("offset") AS latest_offset
        |  FROM records GROUP BY topic, partition),
        |committed AS (
        |  SELECT topic, partition,
        |         COALESCE(MAX("offset"), -1) AS commit_offset
        |  FROM records WHERE event_id % 10 < 8 GROUP BY topic, partition)
        |SELECT l.topic, CAST(l.partition AS BIGINT) AS partition,
        |  CAST(l.latest_offset AS BIGINT) AS latest_offset,
        |  CAST(COALESCE(c.commit_offset, -1) AS BIGINT) AS commit_offset,
        |  CAST(GREATEST(l.latest_offset - COALESCE(c.commit_offset, -1), 0)
        |       AS BIGINT) AS lag
        |FROM latest l LEFT JOIN committed c
        |  ON l.topic = c.topic AND l.partition = c.partition
        |ORDER BY l.topic, l.partition""".stripMargin)))

  // A2 — no-progress detection over daily snapshots: commit unchanged, lag > 0.
  private val a2 = QueryDef(
    "a2_no_progress",
    (s, dir) => {
      val r = records(s, dir)
        .withColumn("day", (floor(unix_timestamp(col("timestamp")) / 86400L) * 86400L).cast("long"))
      val daily = r.groupBy("topic", "partition", "day")
        .agg(max("offset").as("latest_d"),
          max(when(col("event_id") % 10 < 3, col("offset"))).as("commit_d"))
      val wc = Window.partitionBy("topic", "partition").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val snapshots = daily
        .withColumn("latest_offset", max("latest_d").over(wc))
        .withColumn("commit_offset", coalesce(max("commit_d").over(wc), lit(-1L)))
        .select(col("topic"), col("partition"), col("day").as("snap_ts"),
          col("commit_offset"), col("latest_offset"))
      Monitoring.noProgressPartitions(snapshots)
        .select(col("topic"), col("partition").cast("long").as("partition"),
          col("snap_ts").cast("long").as("snap_ts"),
          col("commit_offset").cast("long").as("commit_offset"),
          col("lag").cast("long").as("lag"))
        .orderBy("topic", "partition", "snap_ts")
    },
    Some(withRecords(
      """, daily AS (
        |  SELECT topic, partition,
        |    CAST(FLOOR(epoch(timestamp) / 86400) * 86400 AS BIGINT) AS day,
        |    MAX("offset") AS latest_d,
        |    MAX(CASE WHEN event_id % 10 < 3 THEN "offset" END) AS commit_d
        |  FROM records GROUP BY topic, partition, 3),
        |snapshots AS (
        |  SELECT topic, partition, day AS snap_ts,
        |    COALESCE(MAX(commit_d) OVER w, -1) AS commit_offset,
        |    MAX(latest_d) OVER w AS latest_offset
        |  FROM daily
        |  WINDOW w AS (PARTITION BY topic, partition ORDER BY day
        |               ROWS UNBOUNDED PRECEDING)),
        |flagged AS (
        |  SELECT *, LAG(commit_offset) OVER (PARTITION BY topic, partition
        |                                     ORDER BY snap_ts) AS prev_commit
        |  FROM snapshots)
        |SELECT topic, CAST(partition AS BIGINT) AS partition,
        |  CAST(snap_ts AS BIGINT) AS snap_ts,
        |  CAST(commit_offset AS BIGINT) AS commit_offset,
        |  CAST(latest_offset - commit_offset AS BIGINT) AS lag
        |FROM flagged
        |WHERE prev_commit IS NOT NULL AND commit_offset = prev_commit
        |  AND latest_offset > commit_offset
        |ORDER BY topic, partition, snap_ts""".stripMargin)))

  // A3 — workload rates over 10-minute windows.
  private val a3 = QueryDef(
    "a3_workload_rates",
    (s, dir) => {
      val raw = Records.table(s, dir, "events").select(
        col("event_type").as("topic"), col("ts"),
        length(col("props")).cast("long").as("bytes"), lit(1L).as("msgs"))
      Monitoring.workloadRates(raw, 600)
        .select(col("topic"), col("window_start"),
          col("bytes_per_sec"), col("msgs_per_sec"))
        .orderBy("topic", "window_start")
    },
    Some(
      """SELECT event_type AS topic,
        |  CAST(FLOOR(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
        |  CAST(SUM(length(props)) AS DOUBLE) / 600 AS bytes_per_sec,
        |  CAST(COUNT(*) AS DOUBLE) / 600 AS msgs_per_sec
        |FROM events GROUP BY topic, window_start
        |ORDER BY topic, window_start""".stripMargin))

  // A3b — peak (max-over-lookback) workload per topic.
  private val a3b = QueryDef(
    "a3_peak_workload",
    (s, dir) => {
      val raw = Records.table(s, dir, "events").select(
        col("event_type").as("topic"), col("ts"),
        length(col("props")).cast("long").as("bytes"), lit(1L).as("msgs"))
      Monitoring.peakWorkload(Monitoring.workloadRates(raw, 600))
        .orderBy("topic")
    },
    Some(
      """SELECT topic, MAX(bytes_per_sec) AS peak_bytes_per_sec,
        |       MAX(msgs_per_sec) AS peak_msgs_per_sec
        |FROM (
        |  SELECT event_type AS topic,
        |    CAST(FLOOR(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
        |    CAST(SUM(length(props)) AS DOUBLE) / 600 AS bytes_per_sec,
        |    CAST(COUNT(*) AS DOUBLE) / 600 AS msgs_per_sec
        |  FROM events GROUP BY topic, window_start)
        |GROUP BY topic ORDER BY topic""".stripMargin))

  // A3c — the retriever's full retention/lookback policy: fine 10-min
  // windows for the last hour, coarse 3-h windows to the 25-h horizon,
  // serving = max-bytes window over a 2-h lookback when fresh samples
  // exist (else the whole retention), ties to the earliest window.
  private val a3c = QueryDef(
    "a3_lookback",
    (s, dir) => {
      val raw = Records.table(s, dir, "events").select(
        col("event_type").as("topic"), col("ts"),
        length(col("props")).cast("long").as("bytes"), lit(1L).as("msgs"))
      Monitoring.lookbackWorkload(raw).orderBy("topic")
    },
    Some(
      """WITH raw AS (
        |  SELECT event_type AS topic,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
        |    CAST(length(props) AS BIGINT) AS bytes,
        |    CAST(1 AS BIGINT) AS msgs
        |  FROM events),
        |n AS (SELECT MAX(es) AS now_s FROM raw),
        |base AS (
        |  SELECT topic, es, bytes, msgs, now_s,
        |    CASE WHEN es > now_s - 3600 THEN 600 ELSE 10800 END AS len
        |  FROM raw, n WHERE es > now_s - 90000),
        |rates AS (
        |  SELECT topic, len, (es // len) * len AS window_start,
        |    ANY_VALUE(now_s) AS now_s,
        |    CAST(SUM(bytes) AS DOUBLE) / len AS bytes_per_sec,
        |    CAST(SUM(msgs) AS DOUBLE) / len AS msgs_per_sec
        |  FROM base GROUP BY topic, len, (es // len) * len),
        |aged AS (
        |  SELECT *, LEAST(window_start + len, now_s) AS last_update,
        |    now_s - LEAST(window_start + len, now_s) AS age
        |  FROM rates),
        |fresh AS (SELECT topic, MIN(age) < 7200 AS has_fresh
        |          FROM aged GROUP BY topic),
        |eligible AS (
        |  SELECT a.*, CASE WHEN f.has_fresh THEN 7200 ELSE 90000 END AS lb
        |  FROM aged a JOIN fresh f USING (topic)
        |  WHERE a.age <= CASE WHEN f.has_fresh THEN 7200 ELSE 90000 END)
        |SELECT topic, CAST(lb AS BIGINT) AS lookback_s,
        |  CAST(len AS BIGINT) AS granularity_s,
        |  CAST(window_start AS BIGINT) AS window_start,
        |  ROUND(bytes_per_sec, 4) AS serve_bytes_per_sec,
        |  ROUND(msgs_per_sec, 4) AS serve_msgs_per_sec
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY topic
        |        ORDER BY bytes_per_sec DESC, last_update ASC) AS rn
        |      FROM eligible)
        |WHERE rn = 1 ORDER BY topic""".stripMargin))

  // A4 — per-instance workload: exact byte totals + derived rate.
  private val a4 = QueryDef(
    "a4_instance_workload",
    (s, dir) => {
      val perPartition = records(s, dir)
        .groupBy("topic", "partition")
        .agg(sum(length(col("value")).cast("long")).as("bytes"))
        .withColumn("instance", concat(lit("worker-"), col("partition") % 4))
      perPartition.groupBy("instance")
        .agg(sum("bytes").as("total_bytes"), count(lit(1)).as("num_partitions"))
        .select(col("instance"), col("total_bytes"),
          col("num_partitions"),
          round(col("total_bytes") / 3600.0, 6).as("bytes_per_hour_rate"))
        .orderBy("instance")
    },
    Some(withRecords(
      """, per_partition AS (
        |  SELECT topic, partition, 'worker-' || CAST(partition % 4 AS VARCHAR) AS instance,
        |         CAST(SUM(length(value)) AS BIGINT) AS bytes
        |  FROM records GROUP BY topic, partition)
        |SELECT instance, CAST(SUM(bytes) AS BIGINT) AS total_bytes,
        |  CAST(COUNT(*) AS BIGINT) AS num_partitions,
        |  ROUND(CAST(SUM(bytes) AS DOUBLE) / 3600.0, 6) AS bytes_per_hour_rate
        |FROM per_partition GROUP BY instance ORDER BY instance""".stripMargin)))

  // A5 — expected-worker calculation: ceil(total/maxPerWorker) + lagging.
  private val a5 = QueryDef(
    "a5_expected_workers",
    (s, dir) => {
      val r = records(s, dir)
      val totalBytes = r.agg(sum(length(col("value")).cast("long")).as("total_bytes"))
      val latest = r.groupBy("topic", "partition").agg(max("offset").as("latest_offset"))
      val committed = r.filter(col("event_id") % 10 < 8)
        .groupBy("topic", "partition").agg(max("offset").as("commit_offset"))
      val lagging = Monitoring.partitionLag(latest, committed)
        .filter(col("lag") > 3)
        .agg(count(lit(1)).as("num_lagging"))
      totalBytes.crossJoin(lagging)
        .select(col("total_bytes"), col("num_lagging"),
          (ceil(col("total_bytes") / 8192.0) + col("num_lagging"))
            .cast("long").as("expected_workers"))
    },
    Some(withRecords(
      """, total AS (SELECT CAST(SUM(length(value)) AS BIGINT) AS total_bytes FROM records),
        |latest AS (SELECT topic, partition, MAX("offset") AS latest_offset
        |           FROM records GROUP BY topic, partition),
        |committed AS (SELECT topic, partition, MAX("offset") AS commit_offset
        |              FROM records WHERE event_id % 10 < 8 GROUP BY topic, partition),
        |lagging AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS num_lagging
        |  FROM latest l LEFT JOIN committed c
        |    ON l.topic = c.topic AND l.partition = c.partition
        |  WHERE GREATEST(l.latest_offset - COALESCE(c.commit_offset, -1), 0) > 3)
        |SELECT total_bytes, num_lagging,
        |  CAST(CEIL(CAST(total_bytes AS DOUBLE) / 8192.0) AS BIGINT) + num_lagging
        |    AS expected_workers
        |FROM total, lagging""".stripMargin)))

  // A6 — lifecycle-state counts per instance.
  private val a6 = QueryDef(
    "a6_state_counts",
    (s, dir) => {
      val assignment = records(s, dir).select("topic", "partition").distinct()
        .withColumn("instance", concat(lit("worker-"), col("partition") % 4))
        .withColumn("state",
          when(col("partition") % 3 === 0, "ONLINE")
            .when(col("partition") % 3 === 1, "OFFLINE")
            .otherwise("ERROR"))
      Monitoring.stateCounts(assignment).orderBy("instance", "state")
    },
    Some(withRecords(
      """, assignment AS (
        |  SELECT DISTINCT topic, partition,
        |    'worker-' || CAST(partition % 4 AS VARCHAR) AS instance,
        |    CASE partition % 3 WHEN 0 THEN 'ONLINE' WHEN 1 THEN 'OFFLINE'
        |         ELSE 'ERROR' END AS state
        |  FROM records)
        |SELECT instance, state, CAST(COUNT(*) AS BIGINT) AS n
        |FROM assignment GROUP BY instance, state
        |ORDER BY instance, state""".stripMargin)))

  // A6b — IdealState vs ExternalView mismatch (symmetric difference).
  private val a6b = QueryDef(
    "a6_view_mismatch",
    (s, dir) => {
      val base = records(s, dir).select("topic", "partition").distinct()
        .withColumn("instance", concat(lit("worker-"), col("partition") % 4))
      val ideal = base.withColumn("state", lit("ONLINE"))
      val external = base
        .filter(!(col("topic") === "error" && col("partition") === 7))
        .withColumn("state",
          when(col("partition") === 2, "OFFLINE").otherwise("ONLINE"))
      Monitoring.viewMismatch(ideal, external)
        .select(col("instance"), col("topic"),
          col("partition").cast("long").as("partition"), col("state"), col("only_in"))
        .orderBy("only_in", "topic", "partition", "state")
    },
    Some(withRecords(
      """, base AS (
        |  SELECT DISTINCT topic, partition,
        |    'worker-' || CAST(partition % 4 AS VARCHAR) AS instance
        |  FROM records),
        |ideal AS (SELECT instance, topic, partition, 'ONLINE' AS state FROM base),
        |external AS (
        |  SELECT instance, topic, partition,
        |    CASE WHEN partition = 2 THEN 'OFFLINE' ELSE 'ONLINE' END AS state
        |  FROM base WHERE NOT (topic = 'error' AND partition = 7))
        |SELECT instance, topic, CAST(partition AS BIGINT) AS partition, state, only_in
        |FROM (
        |  SELECT *, 'ideal' AS only_in FROM (SELECT * FROM ideal EXCEPT SELECT * FROM external)
        |  UNION ALL
        |  SELECT *, 'external' AS only_in FROM (SELECT * FROM external EXCEPT SELECT * FROM ideal))
        |ORDER BY only_in, topic, partition, state""".stripMargin)))

  // A7 — manager-vs-controller topic view diff.
  private val a7 = QueryDef(
    "a7_topic_view_diff",
    (s, dir) => {
      import s.implicits._
      val observed = records(s, dir).select("topic").distinct()
      val managerView = observed.unionAll(Seq("pending_topic").toDF("topic"))
      val controllerView = observed.filter(col("topic") =!= "signup")
      Monitoring.topicViewDiff(managerView, controllerView)
        .orderBy("only_in", "topic")
    },
    Some(withRecords(
      """, observed AS (SELECT DISTINCT topic FROM records),
        |manager AS (SELECT topic FROM observed UNION ALL SELECT 'pending_topic'),
        |controller AS (SELECT topic FROM observed WHERE topic <> 'signup')
        |SELECT topic, 'manager' AS only_in
        |FROM (SELECT DISTINCT topic FROM manager EXCEPT SELECT topic FROM controller)
        |UNION ALL
        |SELECT topic, 'controller' AS only_in
        |FROM (SELECT DISTINCT topic FROM controller EXCEPT SELECT topic FROM manager)
        |ORDER BY only_in, topic""".stripMargin)))

  // O1 — least-loaded instance selection (top-k by workload asc).
  // The unpartitioned Window ranks *instances* — input is the per-instance
  // aggregate, bounded by cluster size (thousands at 100×), never records;
  // the single-task sort is over that small aggregate only.
  private val o1 = QueryDef(
    "o1_least_loaded",
    (s, dir) => {
      val byInstance = records(s, dir)
        .withColumn("instance", concat(lit("worker-"), col("partition") % 4))
        .groupBy("instance")
        .agg(sum(length(col("value")).cast("long")).as("total_bytes"),
          count(lit(1)).as("n_records"))
      byInstance
        .withColumn("rank", row_number().over(
          Window.orderBy(col("total_bytes"), col("instance"))).cast("long"))
        .filter(col("rank") <= 3)
        .orderBy("rank")
    },
    Some(withRecords(
      """, by_instance AS (
        |  SELECT 'worker-' || CAST(partition % 4 AS VARCHAR) AS instance,
        |    CAST(SUM(length(value)) AS BIGINT) AS total_bytes,
        |    CAST(COUNT(*) AS BIGINT) AS n_records
        |  FROM records GROUP BY 1)
        |SELECT instance, total_bytes, n_records,
        |  CAST(ROW_NUMBER() OVER (ORDER BY total_bytes, instance) AS BIGINT) AS rank
        |FROM by_instance QUALIFY rank <= 3 ORDER BY rank""".stripMargin)))

  // O2 — workload-sorted assignment order (desc, deterministic tie-break).
  // Unpartitioned Window over the per-(topic,partition) workload aggregate:
  // bounded by cluster partition count (≤ ~100k even at 100× metadata),
  // not by record volume — the global sort is a deliberate, documented
  // bound, matching the reference's single-controller sort.
  private val o2 = QueryDef(
    "o2_workload_sorted",
    (s, dir) => {
      records(s, dir)
        .groupBy("topic", "partition")
        .agg(sum(length(col("value")).cast("long")).as("total_bytes"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("total_bytes").desc, col("topic"), col("partition"))).cast("long"))
        .select(col("topic"), col("partition").cast("long").as("partition"),
          col("total_bytes"), col("rank"))
        .orderBy("rank")
    },
    Some(withRecords(
      """SELECT topic, CAST(partition AS BIGINT) AS partition,
        |  CAST(SUM(length(value)) AS BIGINT) AS total_bytes,
        |  CAST(ROW_NUMBER() OVER (ORDER BY SUM(length(value)) DESC, topic, partition)
        |       AS BIGINT) AS rank
        |FROM records GROUP BY topic, partition ORDER BY rank""".stripMargin)))

  // V1 — assignment view: ideal ⨝ external per (topic, partition).
  private val v1 = QueryDef(
    "v1_assignment_view",
    (s, dir) => {
      val base = records(s, dir).select("topic", "partition").distinct()
        .withColumn("instance", concat(lit("worker-"), col("partition") % 4))
      val ideal = base.withColumn("ideal_state", lit("ONLINE"))
      val external = base
        .filter(!(col("topic") === "error" && col("partition") === 7))
        .withColumn("external_state",
          when(col("partition") === 2, "OFFLINE").otherwise("ONLINE"))
        .select(col("topic").as("e_topic"), col("partition").as("e_partition"),
          col("external_state"))
      ideal.join(external,
          ideal("topic") === col("e_topic") && ideal("partition") === col("e_partition"),
          "left")
        .select(col("topic"), col("partition").cast("long").as("partition"),
          col("instance"), col("ideal_state"), col("external_state"))
        .orderBy("topic", "partition")
    },
    Some(withRecords(
      """, base AS (
        |  SELECT DISTINCT topic, partition,
        |    'worker-' || CAST(partition % 4 AS VARCHAR) AS instance
        |  FROM records),
        |external AS (
        |  SELECT topic, partition,
        |    CASE WHEN partition = 2 THEN 'OFFLINE' ELSE 'ONLINE' END AS external_state
        |  FROM base WHERE NOT (topic = 'error' AND partition = 7))
        |SELECT b.topic, CAST(b.partition AS BIGINT) AS partition, b.instance,
        |  'ONLINE' AS ideal_state, e.external_state
        |FROM base b LEFT JOIN external e
        |  ON b.topic = e.topic AND b.partition = e.partition
        |ORDER BY b.topic, b.partition""".stripMargin)))

  // B1 — topic catalog observer: the refreshable (topic, partitionCount)
  // relation (reference `common/core/KafkaBrokerTopicObserver.java:73-283`).
  private val b1 = QueryDef(
    "b1_topic_catalog",
    (s, dir) => {
      val obs = graft.sources.TopicCatalogObserver.fromRecords(() => records(s, dir))
      obs.catalog
        .select(col("topic"),
          col("num_partitions").cast("long").as("num_partitions"))
        .orderBy("topic")
    },
    Some(withRecords(
      """SELECT topic, CAST(MAX(partition) + 1 AS BIGINT) AS num_partitions
        |FROM records GROUP BY topic ORDER BY topic""".stripMargin)))

  // B2 — observer-driven partition remap: T2 fed by the observed dst
  // catalog (here: a destination cluster with half the source partitions)
  // instead of a hard-coded map — the remap follows `refresh()`
  // (reference `common/core/TopicPartitionCountObserver.java:42-136`).
  private val b2 = QueryDef(
    "b2_observed_remap",
    (s, dir) => {
      val obs = graft.sources.TopicCatalogObserver.fromRecords(() => records(s, dir))
      val dstCatalog = obs.catalog.select(col("topic"),
        greatest(lit(1), (col("num_partitions") / 2).cast("int")).as("num_partitions"))
      Transforms.remapPartitionsViaCatalog(records(s, dir), dstCatalog)
        .select(col("event_id").cast("long").as("event_id"), col("topic"),
          col("partition").cast("long").as("dst_partition"))
        .orderBy("event_id")
    },
    Some(withRecords(
      """, cat AS (
        |  SELECT topic,
        |    GREATEST(1, CAST(MAX(partition) + 1 AS BIGINT) // 2) AS nump
        |  FROM records GROUP BY topic)
        |SELECT CAST(r.event_id AS BIGINT) AS event_id, r.topic,
        |  CAST(r.partition % c.nump AS BIGINT) AS dst_partition
        |FROM records r JOIN cat c ON r.topic = c.topic
        |ORDER BY event_id""".stripMargin)))

  // S4 — fetcher sharding by destination leader: records grouped by the
  // destination broker leading their partition, via a broadcast join
  // against the cluster-metadata relation (reference
  // `worker/FetcherManagerGroupByLeaderId.java:66-88`, leader lookup
  // `common/KafkaClusterObserver.java:59-96` — the SURVEY §2.1 mapping).
  private val s4 = QueryDef(
    "s4_leader_shard",
    (s, dir) => {
      val r = records(s, dir)
      val leaders = r.select("topic", "partition").distinct()
        .withColumn("leader_id", pmod(col("partition"), lit(3)))
      val np = leaders.groupBy("leader_id").agg(count(lit(1)).as("n_partitions"))
      val perLeader = r.join(broadcast(leaders), Seq("topic", "partition"))
        .groupBy("leader_id")
        .agg(count(lit(1)).as("n_records"),
          sum(length(col("value")).cast("long")).as("total_bytes"))
      perLeader.join(np, "leader_id")
        .select(col("leader_id").cast("long").as("leader_id"),
          col("n_partitions"), col("n_records"), col("total_bytes"))
        .orderBy("leader_id")
    },
    Some(withRecords(
      """, leaders AS (
        |  SELECT DISTINCT topic, partition, partition % 3 AS leader_id
        |  FROM records),
        |np AS (SELECT leader_id, CAST(COUNT(*) AS BIGINT) AS n_partitions
        |       FROM leaders GROUP BY leader_id),
        |agg AS (
        |  SELECT l.leader_id, CAST(COUNT(*) AS BIGINT) AS n_records,
        |    CAST(SUM(length(r.value)) AS BIGINT) AS total_bytes
        |  FROM records r JOIN leaders l
        |    ON r.topic = l.topic AND r.partition = l.partition
        |  GROUP BY l.leader_id)
        |SELECT CAST(a.leader_id AS BIGINT) AS leader_id, n.n_partitions,
        |  a.n_records, a.total_bytes
        |FROM agg a JOIN np n ON a.leader_id = n.leader_id
        |ORDER BY leader_id""".stripMargin)))

  // F2 — topic delete / blacklist: deleting a topic removes it from the
  // serving set and records it in the blacklist (reference
  // `controller/rest/.../TopicManagementRestletResource.java:206-252`,
  // ZK blacklist `AutoTopicWhitelistingManager.java:252-260`).
  private val f2 = QueryDef(
    "f2_topic_delete",
    (s, dir) => {
      import s.implicits._
      val serving = records(s, dir).select("topic").distinct()
      val deleted = Seq("error", "signup").toDF("topic")
      val remaining = TopicSetOps.applyTopicBlacklist(serving, deleted)
        .withColumn("status", lit("serving"))
      val blacklisted = serving.intersect(deleted)
        .withColumn("status", lit("blacklisted"))
      remaining.unionAll(blacklisted).orderBy("status", "topic")
    },
    Some(withRecords(
      """, serving AS (SELECT DISTINCT topic FROM records),
        |deleted AS (SELECT 'error' AS topic UNION ALL SELECT 'signup')
        |SELECT topic, 'serving' AS status
        |FROM serving WHERE topic NOT IN (SELECT topic FROM deleted)
        |UNION ALL
        |SELECT topic, 'blacklisted' AS status
        |FROM (SELECT topic FROM serving INTERSECT SELECT topic FROM deleted)
        |ORDER BY status, topic""".stripMargin)))

  // A8 — RATE ANOMALY detection: hourly event counts per type, z-scored
  // against that type's own distribution, flagging |z| >= 2.5 hours —
  // the statistical upgrade of A2's "no progress" rule (zero is just the
  // extreme anomaly). Determinism is engineered for the hash gate: the
  // moments are EXACT integer sums (count, Σn, Σn² over bigint hourly
  // counts — no float accumulation order to diverge), and mean/variance
  // are derived from those exact integers with an identical
  // left-to-right double formula on both engines. Scale shape: one
  // map-side-combinable (type, hour) count, one tiny per-type moment
  // aggregate broadcast back — the raw stream is touched once.
  private val a8 = QueryDef(
    "a8_rate_anomaly",
    (s, dir) => {
      val hourly = Records.table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hour"))
        .agg(count(lit(1)).as("n"))
      val stats = hourly.groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("n").as("s1"),
          sum(col("n") * col("n")).as("s2"))
      // cnt >= 2 guard: with a single hourly bucket, (cnt - 1) = 0 makes
      // sd a 0/0 — Spark yields NULL (row silently dropped) while
      // DuckDB yields NaN, which its ordering treats as >= 2.5, so the
      // engines would disagree. One bucket has no distribution to score.
      hourly.join(broadcast(stats.filter(col("cnt") >= 2)), "event_type")
        .withColumn("mean", col("s1").cast("double") / col("cnt"))
        .withColumn("sd", sqrt(
          (col("s2").cast("double") - col("s1").cast("double") * col("s1") /
            col("cnt")) / (col("cnt") - 1)))
        .withColumn("z", round((col("n") - col("mean")) / col("sd"), 4))
        .filter(abs(col("z")) >= 2.5)
        .select(col("event_type"), col("hour"), col("n"),
          round(col("mean"), 4).as("mean"), col("z"))
        .orderBy("event_type", "hour")
    },
    Some(
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(n) AS BIGINT) AS s1, CAST(SUM(n * n) AS BIGINT) AS s2
        |  FROM hourly GROUP BY 1 HAVING COUNT(*) >= 2)
        |SELECT h.event_type, CAST(h.hour AS BIGINT) AS hour, h.n,
        |  ROUND(CAST(s1 AS DOUBLE) / cnt, 4) AS mean,
        |  ROUND((h.n - CAST(s1 AS DOUBLE) / cnt) /
        |    SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / cnt)
        |         / (cnt - 1)), 4) AS z
        |FROM hourly h JOIN stats USING (event_type)
        |WHERE ABS(ROUND((h.n - CAST(s1 AS DOUBLE) / cnt) /
        |    SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / cnt)
        |         / (cnt - 1)), 4)) >= 2.5
        |ORDER BY h.event_type, h.hour""".stripMargin))

  val defs: Seq[QueryDef] = Seq(
    t1, t2, t3, t5, s4, s5, s7, f2, f3, f4, f5, f6,
    a1, a2, a3, a3b, a3c, a4, a5, a6, a6b, a7, a8, o1, o2, v1, b1, b2)
}
