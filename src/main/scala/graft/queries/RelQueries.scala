package graft.queries

import graft.sources.Records
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Standard relational coverage (SURVEY.md §2.2 judge checklist): scans,
 * multi-way joins, hash aggregation, window functions, rollup, top-k.
 * TPC-H-shaped over the fixture star schema.
 *
 * Scale notes (100 TB stance):
 *  - dimension sides (region/nation/supplier/customer/part) are broadcast;
 *    only lineitem⨝orders shuffles, on the join key.
 *  - aggregates are declarative groupBy → map-side partial agg + AQE.
 *  - date filters are pushed to the parquet scan (verified via explain in
 *    tests).
 *  - double sums that feed output are rounded to 2 decimals (sum order is
 *    not associative; the oracle does the same).
 */
object RelQueries {

  // Q1 — pricing summary (TPC-H Q1 shape): wide hash agg over lineitem.
  private val q1 = QueryDef(
    "q1_pricing_summary",
    (s, dir) => {
      Records.table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").cast("double").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  // Q3 — shipping priority: 3-way join, per-order revenue, top 10.
  private val q3 = QueryDef(
    "q3_top_orders",
    (s, dir) => {
      val customer = Records.table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val orders = Records.table(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val lineitem = Records.table(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin))

  // Q5 — local supplier volume: 6-way join through the star schema.
  private val q5 = QueryDef(
    "q5_supplier_volume",
    (s, dir) => {
      val region = Records.table(s, dir, "region")
      val nation = Records.table(s, dir, "nation")
      val supplier = Records.table(s, dir, "supplier")
      val customer = Records.table(s, dir, "customer")
      val orders = Records.table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val lineitem = Records.table(s, dir, "lineitem")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some(
      """SELECT r_name, n_name,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin))

  // Window top-N per group: 3 priciest parts per brand.
  private val qw = QueryDef(
    "q_window_topn",
    (s, dir) => {
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Records.table(s, dir, "part")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), col("rank"))
        .orderBy("p_brand", "rank")
    },
    Some(
      """SELECT p_brand, p_partkey, p_retailprice,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
        |       ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rank
        |FROM part QUALIFY rank <= 3 ORDER BY p_brand, rank""".stripMargin))

  // Rollup: hierarchical totals over (returnflag, linestatus).
  private val qr = QueryDef(
    "q_rollup_sales",
    (s, dir) => {
      Records.table(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },
    Some(
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin))

  // Anti/semi join coverage: customers with and without urgent orders.
  private val qj = QueryDef(
    "q_semi_anti_join",
    (s, dir) => {
      val customer = Records.table(s, dir, "customer")
      val urgent = Records.table(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val withUrgent = customer
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_urgent").as("bucket"))
      val withoutUrgent = customer
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_urgent").as("bucket"))
      withUrgent.unionAll(withoutUrgent)
        .groupBy("bucket").agg(count(lit(1)).as("n"),
          min("c_custkey").as("min_custkey"), max("c_custkey").as("max_custkey"))
        .orderBy("bucket")
    },
    Some(
      """WITH u AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderpriority = '1-URGENT'),
        |tagged AS (
        |  SELECT c_custkey, 'has_urgent' AS bucket FROM customer
        |  WHERE c_custkey IN (SELECT o_custkey FROM u)
        |  UNION ALL
        |  SELECT c_custkey, 'no_urgent' AS bucket FROM customer
        |  WHERE c_custkey NOT IN (SELECT o_custkey FROM u))
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(c_custkey) AS BIGINT) AS min_custkey,
        |  CAST(MAX(c_custkey) AS BIGINT) AS max_custkey
        |FROM tagged GROUP BY bucket ORDER BY bucket""".stripMargin))

  // Q6 — forecast revenue (TPC-H Q6 shape): tight scan-side predicates
  // (all pushed to parquet) into a scalar aggregate.
  private val q6 = QueryDef(
    "q6_forecast_revenue",
    (s, dir) => {
      Records.table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some(
      """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin))

  // Distinct aggregation (TPC-H Q16 shape): distinct suppliers and parts
  // per brand — the distinct-agg rewrite (expand + two-phase agg).
  private val qd = QueryDef(
    "q_distinct_agg",
    (s, dir) => {
      // Multi-column countDistinct plans an Expand that triples the
      // join output through the first-level hash aggregate. That is the
      // RIGHT plan here, verified empirically at 100x (60M lines):
      // Expand 15.4 s vs 16.2 s for the decomposed three-scans-plus-join
      // alternative — the Expand's extra CPU is cheaper than re-scanning
      // lineitem per distinct column, and its state is bounded by
      // distinct (brand, key) combos, not rows, so it is not a memory
      // hazard (unlike the percentile case above). The p8 lesson
      // ("two-level beats countDistinct") applies when the Expand input
      // is itself explode-inflated — not when it is a raw scan.
      val li = Records.table(s, dir, "lineitem")
      val part = Records.table(s, dir, "part")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(countDistinct("l_suppkey").as("n_suppliers"),
          countDistinct("l_partkey").as("n_parts"),
          count(lit(1)).as("n_lines"))
        .orderBy("p_brand")
    },
    Some(
      """SELECT p_brand,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin))

  // Cube: all grouping-set combinations over (status, priority).
  private val qc = QueryDef(
    "q_cube_orders",
    (s, dir) => {
      Records.table(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },
    Some(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin))

  // Correlated EXISTS (TPC-H Q4 shape): orders with at least one line
  // shipped after the order date, counted per priority. The semi join is
  // the EXISTS plan.
  private val qe = QueryDef(
    "q_exists_orders",
    (s, dir) => {
      val orders = Records.table(s, dir, "orders")
      val li = Records.table(s, dir, "lineitem")
      orders.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },
    Some(
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // Outer join preserving unmatched rows: urgent orders per customer
  // (0 for customers without any), histogrammed.
  private val qo = QueryDef(
    "q_outer_join_hist",
    (s, dir) => {
      val customer = Records.table(s, dir, "customer")
      val urgent = Records.table(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      customer.join(urgent, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_urgent"))
        .groupBy("n_urgent")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("n_urgent")
    },
    Some(
      """WITH per_cust AS (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_urgent
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT n_urgent, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM per_cust GROUP BY n_urgent ORDER BY n_urgent""".stripMargin))

  // Scalar-function coverage: JSON extraction + date parts + string ops
  // over the events stream table. The JSON parse is the per-row cost
  // and the sf0.1 fixture is a handful of row groups, so the scan gets
  // 3-4 splits and one task dominates the query (max_task ~87% of
  // wall in the r14 full-bench artifact) — the single-file-fixture
  // pitfall. The parallelism-floor repartition below is fixture-only
  // by construction: at sf10 the scan already has 30+ splits, the
  // guard is false and no shuffle is added (verified — sf10 numbers
  // unchanged); all aggregates here (count/sum/min/max over BIGINT)
  // are order-free, so the shuffle cannot move the gate result.
  private val qs = QueryDef(
    "q_scalar_funcs",
    (s, dir) => {
      val ev0 = Records.table(s, dir, "events")
      val ev =
        if (ev0.rdd.getNumPartitions < s.sparkContext.defaultParallelism)
          ev0.repartition(s.sparkContext.defaultParallelism)
        else ev0
      ev
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(upper(col("event_type")).as("event_type_uc"),
          year(col("ts")).cast("long").as("yr"),
          quarter(col("ts")).cast("long").as("qtr"))
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type_uc", "yr", "qtr")
    },
    Some(
      """SELECT UPPER(event_type) AS event_type_uc,
        |  CAST(year(ts) AS BIGINT) AS yr,
        |  CAST(quarter(ts) AS BIGINT) AS qtr,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type_uc, yr, qtr
        |ORDER BY event_type_uc, yr, qtr""".stripMargin))

  // Exact interpolated percentiles (sort-based aggregate): Spark
  // `percentile` and DuckDB `quantile_cont` share the continuous
  // interpolation definition, so the values hash-match exactly.
  // Exact percentiles by HISTOGRAM NARROWING, not by the `percentile`
  // aggregate and not by a per-group global sort. The exact aggregate
  // buffers EVERY value of a group (state = O(rows/group) — measured
  // superlinear, 74 s at 100x, and a 100 TB group is a straight OOM).
  // The round-7 sort form fixed that (24.3 s at 100x) but serialized
  // each group's sort into one window partition — 3 statuses = 3-way
  // parallelism, the documented floor (102.6 s at 300x). This form
  // removes the floor: pass 1 builds a unit-width value histogram
  // (groupBy (status, floor(price)) — map-side combinable, ~value-range
  // sized, NOT row-count sized) and a cumulative count per bucket (the
  // window runs over histogram buckets, thousands of rows, not raw
  // rows); each interpolation rank then locates the ONE bucket whose
  // cumulative range covers it. Pass 2 rescans raw rows, keeps only the
  // ≤4 located buckets per group (broadcast semi-structure), sorts
  // WITHIN each tiny bucket (parallel across buckets, ~rows/buckets
  // each), and global rank = bucket-local row_number + rows-before-
  // bucket. Ties share a value, so rank→value is deterministic under
  // either tie order. Both passes are fully parallel scans; worst task
  // is a single bucket's sort. Interpolation is lower + d·(higher −
  // lower), the same formula as Spark's `percentile` and DuckDB's
  // `quantile_cont`, so the gate result is unchanged. When exactness
  // can be traded, approx_percentile (t-digest) remains the one-pass
  // escape hatch — it just can't sit under a cross-engine hash gate.
  private val qp = QueryDef(
    "q_percentiles",
    (s, dir) => {
      val o = Records.table(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_totalprice"))
      graft.operators.Quantiles
        .exactGrouped(o, "o_orderstatus", "o_totalprice", Seq(0.5, 0.9))
        .select(col("o_orderstatus"),
          round(col("q0"), 4).as("p50"),
          round(col("q1"), 4).as("p90"),
          col("n"))
        .orderBy("o_orderstatus")
    },
    Some(
      """SELECT o_orderstatus,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  // Scalar subquery (TPC-H Q15 shape): suppliers whose revenue equals
  // the global maximum — the max computed once and broadcast, not a
  // driver-side collect.
  private val qt = QueryDef(
    "q15_top_supplier",
    (s, dir) => {
      val revenue = Records.table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("total_revenue"))
      val mx = revenue.agg(max("total_revenue").as("max_revenue"))
      revenue.join(broadcast(mx), col("total_revenue") === col("max_revenue"))
        .join(broadcast(Records.table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some(
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin))

  // Q10 — returned-item report: 3-way join over the R-flag lines,
  // revenue per customer, top 20.
  private val q10 = QueryDef(
    "q10_returned_items",
    (s, dir) => {
      val li = Records.table(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val orders = Records.table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val customer = Records.table(s, dir, "customer")
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(
      """SELECT c_custkey, c_name, c_mktsegment,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_mktsegment
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin))

  // Q19 — disjunction of conjunctive brand/size/quantity ranges: the
  // OR-of-ANDs predicate shape that exercises CNF conversion and partial
  // pushdown of the common conjuncts.
  private val q19 = QueryDef(
    "q19_disjunctive_filter",
    (s, dir) => {
      val li = Records.table(s, dir, "lineitem")
      val part = Records.table(s, dir, "part")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 40)))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some(
      """SELECT ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 40)""".stripMargin))

  // Q17 — small-quantity revenue (TPC-H Q17 shape): the canonical
  // CORRELATED SCALAR SUBQUERY (per-part average quantity referenced
  // from the outer predicate), written the way it must execute at scale:
  // DECORRELATED. The per-partkey threshold is one map-side-combinable
  // aggregate over lineitem, and both the threshold join and the part
  // filter join hit the same l_partkey key, so AQE plans a single
  // shuffle family instead of a per-outer-row re-scan (what a naive
  // correlated execution — or a lateral — would do n times). The
  // brand filter side is dimension-sized and broadcasts.
  private val q17 = QueryDef(
    "q17_small_qty_revenue",
    (s, dir) => {
      val li = Records.table(s, dir, "lineitem")
      val part = Records.table(s, dir, "part")
      val thr = li.groupBy(col("l_partkey").as("t_partkey"))
        .agg((lit(0.2) * avg("l_quantity")).as("qty_thr"))
      li.join(broadcast(part.filter(col("p_brand") === "Brand#23")
            .select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(thr, col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < col("qty_thr"))
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
    },
    Some(
      """WITH thr AS (SELECT l_partkey AS t_partkey,
        |               0.2 * AVG(l_quantity) AS qty_thr
        |             FROM lineitem GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
        |JOIN thr ON thr.t_partkey = l.l_partkey
        |WHERE l.l_quantity < thr.qty_thr""".stripMargin))

  // Q18 — large-volume orders (TPC-H Q18 shape): IN-subquery-with-HAVING
  // as a semi-join against an aggregate. The qualifying-order set is a
  // groupBy(l_orderkey) HAVING sum > 250; the main 3-way join then
  // semi-joins it. l_orderkey keys both the HAVING aggregate and the
  // lineitem re-join, so the aggregate reuses the same shuffle
  // partitioning; customer is dimension-sized and broadcasts; final
  // top-100 is a partial TakeOrdered, not a global sort.
  private val q18 = QueryDef(
    "q18_large_orders",
    (s, dir) => {
      val li = Records.table(s, dir, "lineitem")
      val orders = Records.table(s, dir, "orders")
      val cust = Records.table(s, dir, "customer")
      val big = li.groupBy("l_orderkey")
        .agg(sum("l_quantity").as("total_qty"))
        .filter(col("total_qty") > 250.0)
      orders.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("o_epoch"),
          col("o_totalprice"),
          round(col("total_qty"), 2).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_epoch"), col("o_orderkey"))
        .limit(100)
    },
    Some(
      """SELECT c_name, c_custkey, o_orderkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS o_epoch, o_totalprice,
        |  ROUND(total_qty, 2) AS total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
        |      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 250.0) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_epoch, o_orderkey
        |LIMIT 100""".stripMargin))

  // Q22 — dormant high-balance customers (TPC-H Q22 shape): a GLOBAL
  // scalar aggregate threshold (avg positive balance — one row,
  // broadcast via cross join, never a shuffle) combined with a
  // NOT-EXISTS decorrelated to a LEFT ANTI join on the recent-order
  // key set. The anti-join's build side is pre-aggregated to distinct
  // custkeys AFTER the date filter is pushed to the orders scan, so
  // the state the join carries is active-customer-sized, not
  // order-count-sized.
  private val q22 = QueryDef(
    "q22_dormant_customers",
    (s, dir) => {
      val cust = Records.table(s, dir, "customer")
      val orders = Records.table(s, dir, "orders")
      val nation = Records.table(s, dir, "nation")
      val thr = cust.filter(col("c_acctbal") > 0.0)
        .agg(avg("c_acctbal").as("bal_thr"))
      val active = orders
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select("o_custkey").distinct()
      cust.crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("bal_thr"))
        .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("numcust"),
          round(sum("c_acctbal"), 2).as("totacctbal"))
        .orderBy("n_name")
    },
    Some(
      """WITH thr AS (SELECT AVG(c_acctbal) AS bal_thr
        |             FROM customer WHERE c_acctbal > 0.0)
        |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  ROUND(SUM(c_acctbal), 2) AS totacctbal
        |FROM customer c
        |JOIN nation n ON n.n_nationkey = c.c_nationkey, thr
        |WHERE c.c_acctbal > thr.bal_thr
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY n_name ORDER BY n_name""".stripMargin))

  // Q7 — volume shipping (TPC-H Q7 shape): the DOUBLE-ROLE dimension
  // join — nation joined twice under different aliases (supplier's
  // nation vs customer's nation) with a symmetric pair filter. Both
  // nation sides and both supplier/customer dimensions broadcast; only
  // lineitem⨝orders shuffles, on the join key; the ship-date filter is
  // pushed to the lineitem scan.
  private val q7 = QueryDef(
    "q7_volume_shipping",
    (s, dir) => {
      val li = Records.table(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1995-01-01").cast("timestamp"),
          lit("1998-12-31").cast("timestamp")))
      val n1 = Records.table(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Records.table(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      li.join(Records.table(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Records.table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Records.table(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation").isin("NATION_1", "NATION_2", "NATION_3") &&
          col("cust_nation").isin("NATION_1", "NATION_2", "NATION_3") &&
          col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        // revenue summed in EXACT integer 1e-4 units (cents x percent):
        // a float sum's order-dependent last bits landed exactly on a
        // .005 rounding boundary at sf0.01 and flipped the hash between
        // engines; integer sums cannot (same trick as a8's moments)
        .agg(round(sum((round(col("l_extendedprice") * 100, 0) *
            (lit(100) - round(col("l_discount") * 100, 0))).cast("long"))
            .cast("double") / 10000.0, 2).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some(
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) *
        |    (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
        |    / 10000.0, 2) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |                     AND TIMESTAMP '1998-12-31 00:00:00'
        |  AND n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |  AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin))

  // Q14 — promo revenue ratio (TPC-H Q14 shape): conditional aggregation
  // — two sums over one scan, one gated by a CASE on the broadcast part
  // dimension, emitted as a percentage. Single shuffle (the final 1-row
  // agg); the month filter reaches the lineitem scan.
  private val q14 = QueryDef(
    "q14_promo_revenue",
    (s, dir) => {
      val li = Records.table(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1997-03-01").cast("timestamp"),
          lit("1997-03-31").cast("timestamp")))
      // revenue in EXACT integer 1e-4 units (q7's trick): an
      // order-dependent float sum can land on a rounding boundary and
      // flip the cross-engine hash; integer sums cannot. Numerator and
      // denominator share the scaling, so the ratio is unchanged.
      val revUnits = (round(col("l_extendedprice") * 100, 0) *
        (lit(100) - round(col("l_discount") * 100, 0))).cast("long")
      li.join(broadcast(Records.table(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", revUnits).otherwise(lit(0L)))
              .cast("double") /
            sum(revUnits).cast("double"), 4).as("promo_pct"),
          count(lit(1)).as("n_lines"))
    },
    Some(
      """SELECT ROUND(100.0 *
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) *
        |             (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))
        |        ELSE 0 END) AS DOUBLE) /
        |    CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) *
        |        (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
        |      AS DOUBLE), 4) AS promo_pct,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate BETWEEN TIMESTAMP '1997-03-01 00:00:00'
        |                     AND TIMESTAMP '1997-03-31 00:00:00'""".stripMargin))

  val defs: Seq[QueryDef] = Seq(
    q1, q3, q5, qw, qr, qj, q6, qd, qc, qe, qo, qs, qp, qt, q10, q19,
    q17, q18, q22, q7, q14)
}
