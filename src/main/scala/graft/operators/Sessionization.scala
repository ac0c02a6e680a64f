package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sessions, funnels and last-touch attribution as an engine capability
 * — the library surface behind catalog entries e1/e1b (sessionize),
 * e5/e5b (ordered conversion funnel), e10/e10b (attribution), promoted
 * like [[TemporalJoins]] / [[Dedup]] / [[Sampling]]: parameterized
 * functions first, bench entries as thin calls.
 *
 * Every operator ships in two physical forms with ONE semantics:
 *
 *  - The PLAIN form pays one per-user ordered window pass — optimal
 *    until a single hot key (one bot user) serializes into one task.
 *  - The BUCKETED form re-keys the inherently-sequential pass on
 *    (user, fixed-width time bucket) and restores the exact global
 *    answer from per-bucket summaries, bounding the worst task by the
 *    hottest (user, bucket) instead of the hottest user. Bucketing is
 *    INVISIBLE: SessionizeProps / FunnelProps pin bucketed ≡ plain on
 *    random boundary-heavy timelines, and the paired catalog entries
 *    share one oracle.
 *
 * The funnel's bucketed form generalizes e5b's pseudo-event reduction
 * to ANY stage chain: within each (user, bucket), witnesses w(j,k) =
 * first stage-k event completing the bucket-LOCAL chain started at the
 * bucket's unconditional first stage-j event (j ≤ k; j = k is that
 * unconditional first itself). Every greedy global chain event is
 * either its bucket's unconditional first of its type (when the chain
 * enters the bucket there) or reproduced by the local chain from the
 * unconditional first where the chain last entered this bucket — so
 * replaying the EXACT plain funnel over the ≤ n(n+1)/2 witnesses per
 * (user, bucket) yields identical per-user stage flags, while a hot
 * user contributes ~n²/2 rows per bucket to the global pass instead of
 * millions. Witnesses are real events, so the reduction can never
 * fabricate a chain the full stream lacks.
 *
 * Reference anchor: uReplicator validates per-record pipelines by
 * content (`uReplicator-Worker/.../WorkerInstanceTest.java`); these are
 * the product-analytics operators a training-data pipeline derives
 * engagement labels with, over the same events table as
 * [[TemporalJoins]].
 */
object Sessionization {

  /** Column names an event stream is parameterized over: a user key, a
    * unique tie-breaking event id, an event-type discriminator, and an
    * event-time timestamp. */
  final case class EventCols(
      user: String = "user_id",
      id: String = "event_id",
      tpe: String = "event_type",
      ts: String = "ts")

  // ------------------------------------------------------ sessionize

  /** Gap-based sessions: a new session starts when a user's gap since
    * their previous event exceeds `gapSeconds` (ties order by
    * (ts, id)). Output: (user, session_id, n_events, session_start,
    * session_end) with epochs in seconds, sorted. One ordered window
    * pass partitioned by bare user — see [[sessionizeBucketed]] for
    * the hot-user-safe twin. */
  def sessionize(events: DataFrame, gapSeconds: Long,
      cols: EventCols = EventCols()): DataFrame = {
    val w = Window.partitionBy(cols.user).orderBy(cols.ts, cols.id)
    val ws = Window.partitionBy(cols.user).orderBy(cols.ts, cols.id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("epoch", unix_timestamp(col(cols.ts)))
      .withColumn("gap", col("epoch") - lag("epoch", 1).over(w))
      .withColumn("new_session",
        when(col("gap").isNull || col("gap") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(ws))
      .groupBy(cols.user, "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("epoch").as("session_start"), max("epoch").as("session_end"))
      .select(col(cols.user), col("session_id"), col("n_events"),
        col("session_start"), col("session_end"))
      .orderBy(cols.user, "session_id")
  }

  /** Hot-user-safe sessionizer: identical output to [[sessionize]],
    * but the ordered pass runs per (user, `bucketSeconds`-wide bucket)
    * and a per-bucket summary window — bucket-count-sized, not
    * event-sized — restores cross-bucket session chains exactly: a
    * bucket's FIRST local session merges backward when the boundary
    * gap is ≤ `gapSeconds` (sessions can chain through consecutive
    * merges; an empty intervening bucket makes a merge impossible
    * because `bucketSeconds` > `gapSeconds`), and each event's global
    * id = sessions STARTED before its bucket + its local id, minus the
    * merge adjustment. The big shuffle keys on (user, bucket) — worst
    * task bounded by the hottest (user, bucket). */
  def sessionizeBucketed(events: DataFrame, gapSeconds: Long,
      bucketSeconds: Long, cols: EventCols = EventCols()): DataFrame = {
    require(bucketSeconds > gapSeconds,
      s"bucketSeconds ($bucketSeconds) must exceed gapSeconds ($gapSeconds): " +
        "the merge-only-at-boundary argument needs an empty bucket to " +
        "guarantee a session break")
    val ev = events
      .withColumn("epoch", unix_timestamp(col(cols.ts)))
      .withColumn("bkt", expr(s"epoch div $bucketSeconds"))
    val wLoc = Window.partitionBy(cols.user, "bkt").orderBy(cols.ts, cols.id)
    val wLocCum = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ev
      .withColumn("lgap", col("epoch") - lag("epoch", 1).over(wLoc))
      .withColumn("lnew",
        when(col("lgap").isNull || col("lgap") > gapSeconds, 1L).otherwise(0L))
      .withColumn("lsid", sum("lnew").over(wLocCum))
    val wU = Window.partitionBy(cols.user).orderBy("bkt")
    val offs = local.groupBy(cols.user, "bkt")
      .agg(min("epoch").as("first_epoch"), max("epoch").as("last_epoch"),
        max("lsid").as("nloc"))
      .withColumn("prev_last", lag("last_epoch", 1).over(wU))
      .withColumn("merge", when(col("prev_last").isNotNull &&
        col("first_epoch") - col("prev_last") <= gapSeconds, 1L).otherwise(0L))
      .withColumn("cbefore", coalesce(sum(col("nloc") - col("merge"))
        .over(wU.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(cols.user), col("bkt"), col("merge"), col("cbefore"))
    local.join(offs, Seq(cols.user, "bkt"))
      .withColumn("session_id",
        when(col("merge") === 1L && col("lsid") === 1L, col("cbefore"))
          .otherwise(col("cbefore") + col("lsid") - col("merge")))
      .groupBy(cols.user, "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("epoch").as("session_start"), max("epoch").as("session_end"))
      .select(col(cols.user), col("session_id"), col("n_events"),
        col("session_start"), col("session_end"))
      .orderBy(cols.user, "session_id")
  }

  // ---------------------------------------------------------- funnel

  /** Stage-flag columns of the plain funnel chain: m_i = running min
    * event-time of a `stages(i)`-typed event at-or-after stage i−1's
    * completion, all sharing ONE window spec so Catalyst plans a
    * single user-keyed exchange with stacked Window operators. Input
    * needs (user, id, tpe, us). */
  private def chainMins(staged: DataFrame, stages: Seq[String],
      cols: EventCols): DataFrame = {
    val w = Window.partitionBy(cols.user).orderBy("us", cols.id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stages.zipWithIndex.foldLeft(staged) { case (d, (st, i)) =>
      val cond =
        if (i == 0) col(cols.tpe) === st
        else col(cols.tpe) === st && col(s"m_${i - 1}").isNotNull
      d.withColumn(s"m_$i", min(when(cond, col("us"))).over(w))
    }
  }

  /** Per-user 0/1 completion flags f_0..f_{n-1} from the chain mins. */
  private def stageFlags(chained: DataFrame, n: Int,
      cols: EventCols): DataFrame =
    chained.groupBy(cols.user).agg(
      max(when(col("m_0").isNotNull, lit(1L)).otherwise(lit(0L))).as("f_0"),
      (1 until n).map(i =>
        max(when(col(s"m_$i").isNotNull, lit(1L)).otherwise(lit(0L)))
          .as(s"f_$i")): _*)

  /** One (stage, n_users) row per label via a stack projection over the
    * 1-row totals. */
  private def stackStages(totals: DataFrame, labels: Seq[String],
      counts: Seq[String]): DataFrame = {
    val pairs = labels.zip(counts)
      .map { case (l, c) => s"${SqlLit.quote(l)}, $c" }.mkString(", ")
    totals
      .selectExpr(s"stack(${labels.size}, $pairs) AS (stage, n_users)")
      .orderBy("stage")
  }

  /** Ordered conversion funnel: count users who progressed through
    * `stages` (event-type, label) IN TIMESTAMP ORDER — stage k counts
    * only events at-or-after the user's first stage-(k−1) completion;
    * ties break on the event id. Output: one (stage, n_users) row per
    * label, plus `activeLabel` counting every user seen. The whole
    * funnel costs one shuffle of the events table (stacked windows
    * over one spec), then a per-user flag aggregation and a
    * constant-size census. */
  def funnel(events: DataFrame, stages: Seq[(String, String)],
      activeLabel: String, cols: EventCols = EventCols()): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    require(stages.map(_._1).distinct.size == stages.size,
      "stage event types must be distinct")
    val staged = events.select(col(cols.user), col(cols.id), col(cols.tpe),
      unix_micros(col(cols.ts)).as("us"))
    val perUser = stageFlags(
      chainMins(staged, stages.map(_._1), cols), stages.size, cols)
    // coalesce: a zero-user corpus must census 0 at every stage, not null
    val totals = perUser.agg(
      count(lit(1)).as("u_active"),
      stages.indices.map(i =>
        coalesce(sum(s"f_$i"), lit(0L)).as(s"u_$i")): _*)
    stackStages(totals, activeLabel +: stages.map(_._2),
      "u_active" +: stages.indices.map(i => s"u_$i"))
  }

  /** Hot-user-safe funnel: identical output to [[funnel]] via the
    * pseudo-event reduction (see the object Scaladoc). Within each
    * (user, `bucketSeconds` bucket) — ONE bounded sort — stacked local
    * windows extract the bucket's witnesses: for each stage k the
    * unconditional first stage-k event, and for each j < k the first
    * stage-k event completing the local chain started at the bucket's
    * unconditional first stage-j. The exact plain funnel then replays
    * over the ≤ n(n+1)/2 witnesses per (user, bucket); the active-user
    * census comes from a separate two-level distinct, off the ordered
    * path entirely (funnel-typed rows alone cross the big shuffle). */
  def funnelBucketed(events: DataFrame, stages: Seq[(String, String)],
      activeLabel: String, bucketSeconds: Long,
      cols: EventCols = EventCols()): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    require(stages.map(_._1).distinct.size == stages.size,
      "stage event types must be distinct")
    val n = stages.size
    val types = stages.map(_._1)
    val bUs = bucketSeconds * 1000000L
    val se = struct(col("us"), col(cols.id))
    val ev = events.select(col(cols.user), col(cols.id), col(cols.tpe),
      unix_micros(col(cols.ts)).as("us"))
    val wb = Window.partitionBy(cols.user, "bkt").orderBy("us", cols.id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // local chains: seen_j (cheap int flag — only the j-start needs
    // state) then c_j_k stacked over the SAME window spec
    val base = ev
      .filter(col(cols.tpe).isin(types: _*))
      .withColumn("bkt", expr(s"us div $bUs"))
    val withSeen = (0 until n - 1).foldLeft(base) { (d, j) =>
      d.withColumn(s"seen_$j",
        max(when(col(cols.tpe) === types(j), 1)).over(wb))
    }
    val chainCols = for (j <- 0 until n - 1; k <- j + 1 until n) yield (j, k)
    val withChains = chainCols.foldLeft(withSeen) { case (d, (j, k)) =>
      val prev =
        if (k == j + 1) col(s"seen_$j") === 1
        else col(s"c_${j}_${k - 1}").isNotNull
      d.withColumn(s"c_${j}_$k",
        min(when(col(cols.tpe) === types(k) && prev, se)).over(wb))
    }
    // bucket summary: unconditional firsts directly; the running chain
    // mins at the bucket's LAST row (monotone, so max_by reads them).
    // max_by orders by (us, id) — full-precision tie rule.
    val lastBy = struct(col("us"), col(cols.id))
    val aggs =
      (0 until n).map(k =>
        min(when(col(cols.tpe) === types(k), se)).as(s"u_$k")) ++
        chainCols.map { case (j, k) =>
          max_by(col(s"c_${j}_$k"), lastBy).as(s"w_${j}_$k") }
    val summ = withChains.groupBy(cols.user, "bkt")
      .agg(aggs.head, aggs.tail: _*)
    def tag(c: String, t: String) =
      when(col(c).isNotNull, struct(col(s"$c.us").as("us"),
        col(s"$c.${cols.id}").as(cols.id), lit(t).as(cols.tpe)))
    val witnesses =
      (0 until n).map(k => tag(s"u_$k", types(k))) ++
        chainCols.map { case (j, k) => tag(s"w_${j}_$k", types(k)) }
    val pseudo = summ.select(col(cols.user),
        explode(array(witnesses: _*)).as("pe"))
      .filter(col("pe").isNotNull)
      .select(col(cols.user), col("pe.us").as("us"),
        col(s"pe.${cols.id}").as(cols.id),
        col(s"pe.${cols.tpe}").as(cols.tpe))
    val perUser = stageFlags(chainMins(pseudo, types, cols), n, cols)
    // two-level distinct census (no countDistinct Expand), off the
    // ordered path
    val active = ev.groupBy(cols.user).agg(lit(1))
      .agg(count(lit(1)).as("u_active"))
    val totals = perUser.agg(
        coalesce(sum("f_0"), lit(0L)).as("u_0"),
        (1 until n).map(i =>
          coalesce(sum(s"f_$i"), lit(0L)).as(s"u_$i")): _*)
      .crossJoin(active)
    stackStages(totals, activeLabel +: stages.map(_._2),
      "u_active" +: stages.indices.map(i => s"u_$i"))
  }

  // -------------------------------------- windows / cohorts (e2, e9)

  /** Tumbling event-time windows per event type: (type, window_start,
    * n, sum_value) with epoch-floor integer buckets — identical in any
    * engine, no timezone arithmetic. One partial-aggregated shuffle;
    * at 100 TB the output is |types| × |windows|, never event-sized. */
  def tumblingTypeCounts(events: DataFrame, windowSeconds: Long,
      valueCol: String = "value", cols: EventCols = EventCols()): DataFrame =
    events.groupBy(col(cols.tpe),
        (floor(unix_timestamp(col(cols.ts)) / windowSeconds) * windowSeconds)
          .cast("long").as("window_start"))
      .agg(count(lit(1)).as("n"), round(sum(valueCol), 2).as("sum_value"))
      .orderBy(cols.tpe, "window_start")

  /** Retention-cohort matrix: users bucketed by FIRST-seen
    * `periodSeconds`-wide period, counted at each later period offset —
    * (cohort_period, period_offset, n_users). Three bounded shuffles,
    * all partial-aggregated: a (user, period) two-level distinct (never
    * COUNT(DISTINCT)'s Expand), a per-user min for the cohort, and a
    * cohort-sized final count; the user-period table is |users|·|periods|,
    * not |events|. */
  def retentionCohorts(events: DataFrame, periodSeconds: Long,
      cols: EventCols = EventCols()): DataFrame = {
    val uw = events.select(col(cols.user),
        floor(unix_timestamp(col(cols.ts)) / periodSeconds).cast("long")
          .as("period"))
      .distinct()
    val first = uw.groupBy(cols.user).agg(min("period").as("cohort_period"))
    uw.join(first, cols.user)
      .groupBy(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_period", "period_offset")
  }

  // ------------------------------------------------------ last touch

  /** Last-touch attribution: pair every `conversionType` event with the
    * same user's most recent PRECEDING `sourceType` event within
    * `lookbackSeconds` — the within-one-table as-of join, computed as a
    * running carry (`last(…, ignoreNulls)`) in one user-keyed window
    * pass, no self-join. Same-instant ties order by (ts, id). Output:
    * (id, user, conversion_epoch, source_id, secs_since_source),
    * epochs in seconds, sorted by id; unattributed conversions keep
    * null source columns. */
  def lastTouch(events: DataFrame, sourceType: String, conversionType: String,
      lookbackSeconds: Long, cols: EventCols = EventCols()): DataFrame = {
    val w = Window.partitionBy(cols.user).orderBy(cols.ts, cols.id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inWin = col("src_epoch").isNotNull &&
      col("epoch") - col("src_epoch") <= lookbackSeconds
    // only sources feed the carry and only conversions are emitted, so
    // the isin filter reaches the scan and drops every other type
    // before the shuffle
    events
      .filter(col(cols.tpe).isin(sourceType, conversionType))
      .withColumn("epoch", unix_timestamp(col(cols.ts)))
      .withColumn("src_id",
        last(when(col(cols.tpe) === sourceType, col(cols.id)),
          ignoreNulls = true).over(w))
      .withColumn("src_epoch",
        last(when(col(cols.tpe) === sourceType, col("epoch")),
          ignoreNulls = true).over(w))
      .filter(col(cols.tpe) === conversionType)
      .select(col(cols.id), col(cols.user),
        col("epoch").as("conversion_epoch"),
        when(inWin, col("src_id")).as("source_id"),
        when(inWin, col("epoch") - col("src_epoch")).as("secs_since_source"))
      .orderBy(cols.id)
  }

  /** Hot-user-safe attribution: identical output to [[lastTouch]]. The
    * carry is re-keyed on (user, `bucketSeconds` bucket) so a hot user
    * spreads across buckets, and a per-(user, bucket) 1-row summary —
    * the bucket's last source by (epoch, id) — is carried across
    * buckets by a second window whose input is bucket-count-sized.
    * Each conversion takes the latest in-bucket source if one precedes
    * it, else the incoming bucket carry. The tie order (ts, id) is
    * preserved exactly: in-bucket the window orders by it, and across
    * buckets max_by compares the same struct. */
  def lastTouchBucketed(events: DataFrame, sourceType: String,
      conversionType: String, lookbackSeconds: Long, bucketSeconds: Long,
      cols: EventCols = EventCols()): DataFrame = {
    val ev = events
      .filter(col(cols.tpe).isin(sourceType, conversionType))
      .withColumn("epoch", unix_timestamp(col(cols.ts)))
      .withColumn("bkt", (col("epoch") - pmod(col("epoch"), lit(bucketSeconds)))
        .divide(bucketSeconds).cast("long"))
    // per-(user, bucket) last source — map-side-combinable, absorbs the
    // hot user in partial aggregation. The ordering struct (ts, id)
    // reproduces the full-precision tie rule (epoch is second-truncated
    // — ordering by it could flip same-second ties); the carried value
    // keeps (epoch, id) for the output.
    val perBucket = ev
      .groupBy(cols.user, "bkt")
      .agg(max_by(
        when(col(cols.tpe) === sourceType,
          struct(col("epoch"), col(cols.id))),
        when(col(cols.tpe) === sourceType,
          struct(col(cols.ts), col(cols.id)))).as("last_src"))
    val carryW = Window.partitionBy(cols.user).orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = perBucket
      .withColumn("incoming",
        last(col("last_src"), ignoreNulls = true).over(carryW))
      .select(cols.user, "bkt", "incoming")
    val w = Window.partitionBy(cols.user, "bkt").orderBy(cols.ts, cols.id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inWin = col("src_epoch").isNotNull &&
      col("conversion_epoch") - col("src_epoch") <= lookbackSeconds
    ev.join(carry, Seq(cols.user, "bkt"), "left")
      .withColumn("src",
        coalesce(
          last(when(col(cols.tpe) === sourceType,
            struct(col("epoch"), col(cols.id))),
            ignoreNulls = true).over(w),
          col("incoming")))
      .filter(col(cols.tpe) === conversionType)
      .select(col(cols.id), col(cols.user),
        col("epoch").as("conversion_epoch"),
        col("src.epoch").as("src_epoch"),
        col(s"src.${cols.id}").as("sid"))
      .select(col(cols.id), col(cols.user), col("conversion_epoch"),
        when(inWin, col("sid")).as("source_id"),
        when(inWin, col("conversion_epoch") - col("src_epoch"))
          .as("secs_since_source"))
      .orderBy(cols.id)
  }
}
