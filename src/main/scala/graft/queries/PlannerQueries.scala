package graft.queries

import graft.sources.Records
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Oracle-verified entries for the placement planner's decisions O3–O7
 * (SURVEY.md §2.1; reference
 * `controller/core/AutoRebalanceLiveInstanceChangeListener.java:387-753`,
 * `manager/core/ControllerHelixManager.java:951-1108`). Each entry derives
 * deterministic per-partition workloads / lags from the fixture record
 * table, expresses the planner's decision as DataFrame ops, and mirrors
 * it in DuckDB SQL — so the decision itself is under the hash gate, not
 * just unit tests.
 *
 * The driver-side [[graft.operators.Planner]] keeps the reference's
 * greedy mutable-state algorithms for live control; these queries encode
 * the same policies in their SQL-expressible deterministic form
 * (running-sum sheds, rank-based round-robin placement). Unpartitioned
 * windows here rank *instances or partitions of cluster metadata* —
 * bounded by cluster size, never record volume (same documented bound as
 * o1/o2).
 */
object PlannerQueries {

  private def withRecords(sql: String): String =
    s"WITH ${Records.recordsSqlCte}\n$sql"

  private def records(s: SparkSession, dir: String): DataFrame =
    Records.recordsFromEvents(Records.table(s, dir, "events"))

  /** Per-(topic, partition) byte workload with the uniform worker map. */
  private def partitionBytes(r: DataFrame): DataFrame =
    r.groupBy("topic", "partition")
      .agg(sum(length(col("value")).cast("long")).as("bytes"))

  private val ppSql =
    """pp AS (
      |  SELECT topic, partition,
      |    'worker-' || CAST(partition % 4 AS VARCHAR) AS instance,
      |    CAST(SUM(length(value)) AS BIGINT) AS bytes
      |  FROM records GROUP BY topic, partition)""".stripMargin

  /** Per-(topic, partition) lag: commit = max offset among records with
    * event_id % 10 < 8 (same derivation as a1/a5). */
  private def lags(r: DataFrame): DataFrame = {
    val latest = r.groupBy("topic", "partition")
      .agg(max("offset").as("latest_offset"))
    val committed = r.filter(col("event_id") % 10 < 8)
      .groupBy("topic", "partition")
      .agg(max("offset").as("commit_offset"))
    // LEFT join + commit −1 default: never-committed partitions are the
    // maximal-lag case, not rows to drop (matches Monitoring.partitionLag)
    latest.join(committed, Seq("topic", "partition"), "left")
      .withColumn("lag",
        greatest(col("latest_offset") - coalesce(col("commit_offset"), lit(-1L)),
          lit(0L)))
      .select("topic", "partition", "lag")
  }

  private val lagsSql =
    """latest AS (SELECT topic, partition, MAX("offset") AS latest_offset
      |           FROM records GROUP BY topic, partition),
      |committed AS (SELECT topic, partition, MAX("offset") AS commit_offset
      |              FROM records WHERE event_id % 10 < 8
      |              GROUP BY topic, partition),
      |lags AS (
      |  SELECT l.topic, l.partition,
      |    GREATEST(l.latest_offset - COALESCE(c.commit_offset, -1), 0) AS lag
      |  FROM latest l LEFT JOIN committed c
      |    ON l.topic = c.topic AND l.partition = c.partition)""".stripMargin

  // O3 — overload shedding: instances above avg×1.2 shed partitions
  // lightest-first until they fit, always retaining the heaviest. The
  // fixture skews worker-0 (it owns partitions 0–4) so the threshold
  // genuinely fires.
  private val o3 = QueryDef(
    "o3_overload_shed",
    (s, dir) => {
      val pp = partitionBytes(records(s, dir))
        .withColumn("instance", when(col("partition") <= 4, lit("worker-0"))
          .otherwise(concat(lit("worker-"), col("partition") % 4)))
      val loads = pp.groupBy("instance")
        .agg(sum("bytes").as("load"), count(lit(1)).as("np"))
      // average excludes single-partition instances (irreducible load),
      // falling back to the overall average — reference :642-753
      val avgLoad = loads.agg(coalesce(
        avg(when(col("np") > 1, col("load"))), avg(col("load"))).as("avg_load"))
      val w = Window.partitionBy("instance").orderBy("bytes", "topic", "partition")
      val ranked = pp.join(loads, "instance")
        .withColumn("rn", row_number().over(w))
        .withColumn("cum", sum("bytes").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ranked.crossJoin(broadcast(avgLoad))
        .filter(col("rn") < col("np") &&
          (col("load") - col("cum") + col("bytes")) > col("avg_load") * 1.2)
        .select(col("instance"), col("topic"),
          col("partition").cast("long").as("partition"), col("bytes"))
        .orderBy("topic", "partition")
    },
    Some(withRecords(
      """, pp AS (
        |  SELECT topic, partition,
        |    CASE WHEN partition <= 4 THEN 'worker-0'
        |         ELSE 'worker-' || CAST(partition % 4 AS VARCHAR) END AS instance,
        |    CAST(SUM(length(value)) AS BIGINT) AS bytes
        |  FROM records GROUP BY topic, partition),
        |loads AS (SELECT instance, SUM(bytes) AS load, COUNT(*) AS np
        |          FROM pp GROUP BY instance),
        |a AS (SELECT COALESCE(AVG(CASE WHEN np > 1 THEN load END), AVG(load))
        |        AS avg_load FROM loads),
        |ranked AS (
        |  SELECT pp.topic, pp.partition, pp.instance, pp.bytes, l.load, l.np,
        |    ROW_NUMBER() OVER (PARTITION BY pp.instance
        |                       ORDER BY pp.bytes, pp.topic, pp.partition) AS rn,
        |    SUM(pp.bytes) OVER (PARTITION BY pp.instance
        |                        ORDER BY pp.bytes, pp.topic, pp.partition
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM pp JOIN loads l USING (instance))
        |SELECT instance, topic, CAST(partition AS BIGINT) AS partition, bytes
        |FROM ranked, a
        |WHERE rn < np AND (load - cum + bytes) > avg_load * 1.2
        |ORDER BY topic, partition""".stripMargin)))

  // O4 — dedicated-instance split for lagging partitions: up to 50% of
  // instances (at least 1, at most n−1, bounded by the lagging count)
  // become dedicated; deterministic lowest-name-first.
  private val o4 = QueryDef(
    "o4_dedicated_split",
    (s, dir) => {
      val r = records(s, dir)
      val lagging = lags(r).filter(col("lag") > 0)
        .agg(count(lit(1)).as("n_lagging"))
      val insts = r.select(
        concat(lit("worker-"), col("partition") % 4).as("instance")).distinct()
      val nInst = insts.agg(count(lit(1)).as("n_inst"))
      val calc = lagging.crossJoin(nInst).select(
        when(col("n_lagging") === 0, lit(0L)).otherwise(
          least(floor(col("n_inst") * 0.5).cast("long"),
            greatest(lit(1L), least(col("n_lagging"), col("n_inst") - 1))))
          .as("n_ded"),
        col("n_lagging"))
      insts
        .withColumn("irank", row_number().over(Window.orderBy("instance")).cast("long"))
        .crossJoin(broadcast(calc))
        .select(col("instance"),
          when(col("irank") <= col("n_ded"), "dedicated").otherwise("shared")
            .as("role"),
          col("n_lagging"))
        .orderBy("instance")
    },
    Some(withRecords(
      s""", $lagsSql,
         |lagging AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lagging
         |            FROM lags WHERE lag > 0),
         |insts AS (SELECT DISTINCT 'worker-' || CAST(partition % 4 AS VARCHAR)
         |            AS instance FROM records),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_inst FROM insts),
         |calc AS (
         |  SELECT CASE WHEN l.n_lagging = 0 THEN 0
         |    ELSE LEAST(CAST(FLOOR(n.n_inst * 0.5) AS BIGINT),
         |               GREATEST(1, LEAST(l.n_lagging, n.n_inst - 1))) END AS n_ded,
         |    l.n_lagging
         |  FROM lagging l, n)
         |SELECT i.instance,
         |  CASE WHEN ROW_NUMBER() OVER (ORDER BY i.instance) <= c.n_ded
         |       THEN 'dedicated' ELSE 'shared' END AS role,
         |  c.n_lagging
         |FROM insts i, calc c
         |ORDER BY i.instance""".stripMargin)))

  // O5 — stuck-partition movement: partitions whose commit offset stalled
  // (lag > 1 in the fixture derivation) move, at most 3 per pass,
  // round-robin onto instances hosting no stuck partition.
  private val o5 = QueryDef(
    "o5_stuck_moves",
    (s, dir) => {
      val assign = lags(records(s, dir))
        .withColumn("instance", concat(lit("worker-"), col("partition") % 4))
      val stuck = assign.filter(col("lag") > 1)
        .select("topic", "partition", "instance")
      val healthy = assign.select("instance").distinct()
        .join(stuck.select("instance").distinct(), Seq("instance"), "left_anti")
        .withColumn("hrank", row_number().over(Window.orderBy("instance")).cast("long"))
        .select(col("instance").as("to_instance"), col("hrank"))
      val nH = healthy.agg(count(lit(1)).as("n_healthy"))
      stuck
        .withColumn("rn",
          row_number().over(Window.orderBy("topic", "partition")).cast("long"))
        .filter(col("rn") <= 3)
        .crossJoin(broadcast(nH))
        .withColumn("tgt", (col("rn") - 1) % col("n_healthy") + 1)
        .join(broadcast(healthy), col("tgt") === col("hrank"))
        .select(col("topic"), col("partition").cast("long").as("partition"),
          col("instance").as("from_instance"), col("to_instance"))
        .orderBy("topic", "partition")
    },
    Some(withRecords(
      s""", $lagsSql,
         |assign AS (
         |  SELECT topic, partition,
         |    'worker-' || CAST(partition % 4 AS VARCHAR) AS instance, lag
         |  FROM lags),
         |stuck AS (SELECT topic, partition, instance FROM assign WHERE lag > 1),
         |healthy AS (
         |  SELECT instance AS to_instance,
         |    ROW_NUMBER() OVER (ORDER BY instance) AS hrank
         |  FROM (SELECT DISTINCT instance FROM assign
         |        WHERE instance NOT IN (SELECT instance FROM stuck))),
         |nh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_healthy FROM healthy),
         |moves AS (
         |  SELECT topic, partition, instance AS from_instance,
         |    ROW_NUMBER() OVER (ORDER BY topic, partition) AS rn
         |  FROM stuck QUALIFY rn <= 3)
         |SELECT m.topic, CAST(m.partition AS BIGINT) AS partition,
         |  m.from_instance, h.to_instance
         |FROM moves m, nh JOIN healthy h
         |  ON h.hrank = ((m.rn - 1) % nh.n_healthy) + 1
         |ORDER BY m.topic, m.partition""".stripMargin)))

  // O6 — route worker scaling: workers = ceil(bytes / perWorker) clamped
  // to [3, 5] (reference init 3 / max 5; perWorker scaled to fixture
  // bytes the way the reference's 8 MiB is scaled to its 8 MiB/s links).
  private val o6 = QueryDef(
    "o6_route_scale",
    (s, dir) => {
      records(s, dir).groupBy("topic")
        .agg(sum(length(col("value")).cast("long")).as("total_bytes"),
          countDistinct("partition").as("n_partitions"))
        .select(col("topic").as("route"), col("total_bytes"),
          col("n_partitions"),
          least(lit(5L), greatest(lit(3L),
            ceil(col("total_bytes") / 4096.0).cast("long"))).as("workers"))
        .orderBy("route")
    },
    Some(withRecords(
      """SELECT topic AS route, CAST(SUM(length(value)) AS BIGINT) AS total_bytes,
        |  CAST(COUNT(DISTINCT partition) AS BIGINT) AS n_partitions,
        |  CAST(LEAST(5, GREATEST(3,
        |    CAST(CEIL(CAST(SUM(length(value)) AS DOUBLE) / 4096.0) AS BIGINT)))
        |    AS BIGINT) AS workers
        |FROM records GROUP BY topic ORDER BY route""".stripMargin)))

  // O7 — failure replacement: the dead instance's partitions (heaviest
  // first) are re-placed round-robin across surviving instances ranked by
  // their current load (lightest first).
  private val o7 = QueryDef(
    "o7_failure_replace",
    (s, dir) => {
      val pp = partitionBytes(records(s, dir))
        .withColumn("instance", concat(lit("worker-"), col("partition") % 4))
      val orphaned = pp.filter(col("instance") === "worker-0")
        .withColumn("rn", row_number().over(
          Window.orderBy(col("bytes").desc, col("topic"), col("partition"))).cast("long"))
      val surviving = pp.filter(col("instance") =!= "worker-0")
        .groupBy("instance").agg(sum("bytes").as("load"))
        .withColumn("srank", row_number().over(Window.orderBy("load", "instance")).cast("long"))
        .select(col("instance").as("new_instance"), col("srank"))
      val n = surviving.agg(count(lit(1)).as("n"))
      orphaned.crossJoin(broadcast(n))
        .withColumn("tgt", (col("rn") - 1) % col("n") + 1)
        .join(broadcast(surviving), col("tgt") === col("srank"))
        .select(col("topic"), col("partition").cast("long").as("partition"),
          col("bytes"), col("new_instance"))
        .orderBy("topic", "partition")
    },
    Some(withRecords(
      s""", $ppSql,
         |orphaned AS (
         |  SELECT topic, partition, bytes,
         |    ROW_NUMBER() OVER (ORDER BY bytes DESC, topic, partition) AS rn
         |  FROM pp WHERE instance = 'worker-0'),
         |surviving AS (
         |  SELECT instance AS new_instance,
         |    ROW_NUMBER() OVER (ORDER BY SUM(bytes), instance) AS srank
         |  FROM pp WHERE instance <> 'worker-0' GROUP BY instance),
         |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM surviving)
         |SELECT o.topic, CAST(o.partition AS BIGINT) AS partition, o.bytes,
         |  s.new_instance
         |FROM orphaned o, ns JOIN surviving s ON s.srank = ((o.rn - 1) % ns.n) + 1
         |ORDER BY o.topic, o.partition""".stripMargin)))

  val defs: Seq[QueryDef] = Seq(o3, o4, o5, o6, o7)
}
