package graft.queries

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface over the produced tables (SURVEY.md §2.7: the
  * aggregation/window/sort/limit/set-op categories the reference delegates
  * to the storage layer — here expressed as stock Catalyst plans so
  * pushdown, partial aggregation, broadcast joins and AQE all apply).
  *
  * Scale notes (100 TB): every aggregate is map-side partial (hash agg),
  * every small-dimension join is broadcast, every window partitions on a
  * high-cardinality key. No driver-side collects.
  */
object Relational {

  /** Exact integer cents from a 2-decimal double column. `floor(x+0.5)` is
    * codegen-cheap; `round(_, 0)` goes through per-value BigDecimal
    * (2.8× slower on the scan hot path, measured in ProfileMain). Equal to
    * HALF_UP rounding for all inputs whose true value is integral cents:
    * a divergence needs x*100 within 0.5 of a true .5 tie, and the double
    * error of n/100*100 is ~1e-10. The oracle keeps `round(x*100,0)` —
    * values are identical (checked exhaustively at sf0.1). */
  private[queries] def cents(c: Column): Column = floor(c * 100 + 0.5).cast("long")
  /** Exact integer percent from a 2-decimal fraction column. */
  private def pct(c: Column): Column = floor(c * 100 + 0.5).cast("long")

  /** lineitem row count — the table statistic q16's adaptive sample
    * modulus derives from. Read from the parquet FOOTERS
    * (Tables.footerRowCount): O(files) driver-side metadata, no cluster
    * job — exactly where a production warehouse's catalog stats come
    * from. Cheap enough to skip memoizing, which also means a rewritten
    * dataset can never serve a stale count. */
  private def lineitemCount(s: SparkSession, dir: String): Long =
    Tables.footerRowCount(dir, "lineitem")

  val specs: Seq[QuerySpec] = Seq(

    // ----- A: hash aggregation with map-side combine (TPC-H Q1 shape) -----
    QuerySpec(
      "q01_pricing_summary",
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
               CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)*(100-CAST(round(l_discount*100,0) AS BIGINT))) AS DOUBLE)/10000.0 AS sum_disc_price,
               CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)*(100-CAST(round(l_discount*100,0) AS BIGINT))*(100+CAST(round(l_tax*100,0) AS BIGINT))) AS DOUBLE)/1000000.0 AS sum_charge,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)/count(*) AS avg_qty,
               CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)/100.0/count(*) AS avg_price,
               CAST(sum(CAST(round(l_discount*100,0) AS BIGINT)) AS DOUBLE)/100.0/count(*) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp"))
        val ep = cents(col("l_extendedprice"))
        val dc = pct(col("l_discount"))
        val tx = pct(col("l_tax"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast("long")).as("sum_qty"),
            (sum(ep).cast("double") / 100.0).as("sum_base_price"),
            (sum(ep * (lit(100L) - dc)).cast("double") / 10000.0).as("sum_disc_price"),
            (sum(ep * (lit(100L) - dc) * (lit(100L) + tx)).cast("double") / 1000000.0).as("sum_charge"),
            (sum(col("l_quantity").cast("long")).cast("double") / count(lit(1))).as("avg_qty"),
            (sum(ep).cast("double") / 100.0 / count(lit(1))).as("avg_price"),
            (sum(dc).cast("double") / 100.0 / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      }),

    // ----- broadcast join + top-k (small dim side broadcast explicitly) -----
    QuerySpec(
      "q02_top_parts",
      Some("""
        SELECT p.p_partkey, p.p_name,
               CAST(sum(CAST(round(l.l_extendedprice*100,0) AS BIGINT)*(100-CAST(round(l.l_discount*100,0) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_partkey, p.p_name
        ORDER BY revenue DESC, p_partkey ASC
        LIMIT 10"""),
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
        val p = Tables.t(s, dir, "part")
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .groupBy(col("p_partkey"), col("p_name"))
          .agg(
            (sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))).cast("double") / 10000.0).as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("revenue").desc, col("p_partkey").asc)
          .limit(10)
      }),

    // ----- 3-way join, filter pushdown on both fact sides (Q3 shape) -----
    QuerySpec(
      "q03_shipping_priority",
      Some("""
        SELECT o.o_orderkey,
               CAST(sum(CAST(round(l.l_extendedprice*100,0) AS BIGINT)*(100-CAST(round(l.l_discount*100,0) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o.o_orderkey, orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10"""),
      (s, dir) => {
        val c = Tables.t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        val li = Tables.t(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1997-01-01 00:00:00").cast("timestamp"))
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("o_orderpriority"))
          .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))).cast("double") / 10000.0).as("revenue"))
          .select(col("o_orderkey"), col("revenue"), col("orderdate"), col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("o_orderkey").asc)
          .limit(10)
      }),

    // ----- left-semi join (EXISTS) -----
    QuerySpec(
      "q04_priority_semijoin",
      Some("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        val li = Tables.t(s, dir, "lineitem").filter(col("l_quantity") > 45)
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      }),

    // ----- left-anti join (NOT EXISTS) -----
    QuerySpec(
      "q05_customers_no_orders",
      Some("""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""),
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("c_mktsegment"))
      }),

    // ----- selective scan: filter fully pushed to parquet (Q6 shape) -----
    QuerySpec(
      "q06_forecast_revenue",
      Some("""
        SELECT CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)*CAST(round(l_discount*100,0) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND CAST(round(l_discount*100,0) AS BIGINT) BETWEEN 5 AND 7
          AND l_quantity < 24"""),
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp")
            && pct(col("l_discount")).between(5, 7)
            && col("l_quantity") < 24)
        li.agg(
          (sum(cents(col("l_extendedprice")) * pct(col("l_discount"))).cast("double") / 10000.0).as("revenue"),
          count(lit(1)).as("n"))
      }),

    // ----- window: ranking (top-3 orders per customer) -----
    QuerySpec(
      "q07_window_topn",
      Some("""
        SELECT o_custkey, o_orderkey, rn, o_totalprice
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn"""),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        o.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn"))
      }),

    // ----- window: running aggregate frame -----
    QuerySpec(
      "q08_running_total",
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
                 AS running_spend
        FROM orders
        WHERE o_custkey < 100
        ORDER BY o_custkey, o_orderkey"""),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders").filter(col("o_custkey") < 100)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.select(col("o_custkey"), col("o_orderkey"),
          (sum(cents(col("o_totalprice"))).over(w).cast("double") / 100.0).as("running_spend"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      }),

    // ----- exact distinct aggregation -----
    QuerySpec(
      "q09_distinct_customers",
      Some("""
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""),
      (s, dir) =>
        Tables.t(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(countDistinct(col("o_custkey")).as("n_customers"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))),

    // ----- rollup / grouping sets -----
    QuerySpec(
      "q10_rollup_acctbal",
      Some("""
        SELECT coalesce(r_name, 'ALL') AS region_name,
               coalesce(n_name, 'ALL') AS nation_name,
               count(c_custkey) AS n_customers,
               CAST(sum(CAST(round(c_acctbal*100,0) AS BIGINT)) AS DOUBLE)/100.0 AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY region_name, nation_name"""),
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        val n = Tables.t(s, dir, "nation")
        val r = Tables.t(s, dir, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(col("c_custkey")).as("n_customers"),
            (sum(cents(col("c_acctbal"))).cast("double") / 100.0).as("total_acctbal"))
          .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
            coalesce(col("n_name"), lit("ALL")).as("nation_name"),
            col("n_customers"), col("total_acctbal"))
          .orderBy(col("region_name"), col("nation_name"))
      }),

    // ----- set operations -----
    QuerySpec(
      "q11_setops_nations",
      Some("""
        WITH cn AS (SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey),
             sn AS (SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        SELECT 'both' AS side, n_name FROM (SELECT n_name FROM cn INTERSECT SELECT n_name FROM sn)
        UNION ALL
        SELECT 'customer_only' AS side, n_name FROM (SELECT n_name FROM cn EXCEPT SELECT n_name FROM sn)
        UNION ALL
        SELECT 'supplier_only' AS side, n_name FROM (SELECT n_name FROM sn EXCEPT SELECT n_name FROM cn)
        ORDER BY side, n_name"""),
      (s, dir) => {
        val n = Tables.t(s, dir, "nation")
        val c = Tables.t(s, dir, "customer")
        val sp = Tables.t(s, dir, "supplier")
        val cn = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .select(col("n_name")).distinct()
        val sn = sp.join(broadcast(n), sp("s_nationkey") === n("n_nationkey"))
          .select(col("n_name")).distinct()
        cn.intersect(sn).select(lit("both").as("side"), col("n_name"))
          .unionAll(cn.except(sn).select(lit("customer_only").as("side"), col("n_name")))
          .unionAll(sn.except(cn).select(lit("supplier_only").as("side"), col("n_name")))
          .orderBy(col("side"), col("n_name"))
      }),

    // ----- time-bucketed aggregation (batch face of the streaming agg) -----
    QuerySpec(
      "q12_events_hourly",
      Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY 1, 2
        ORDER BY hour, event_type"""),
      (s, dir) =>
        Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "click"))
          .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            (sum(cents(col("value"))).cast("double") / 100.0).as("total_value"))
          .orderBy(col("hour"), col("event_type"))),

    // ----- "above customer average" — integer cross-multiplication, no
    //       float division, exact compare -----
    QuerySpec(
      "q13_above_avg_orders",
      Some("""
        WITH stats AS (
          SELECT o_custkey,
                 sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS sum_cents,
                 count(*) AS cnt
          FROM orders GROUP BY o_custkey)
        SELECT o.o_orderpriority, count(*) AS n_above_avg
        FROM orders o JOIN stats s ON o.o_custkey = s.o_custkey
        WHERE CAST(round(o.o_totalprice*100,0) AS BIGINT) * s.cnt > s.sum_cents
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority"""),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        val stats = o.groupBy(col("o_custkey").as("sk"))
          .agg(sum(cents(col("o_totalprice"))).as("sum_cents"), count(lit(1)).as("cnt"))
        o.join(stats, o("o_custkey") === stats("sk"))
          .filter(cents(col("o_totalprice")) * col("cnt") > col("sum_cents"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_above_avg"))
          .orderBy(col("o_orderpriority"))
      }),

    // ----- as-of join via carry-forward window (Spark) vs ASOF JOIN (DuckDB) -----
    QuerySpec(
      "q14_asof_click_before_purchase",
      // DuckDB keeps ns timestamps while Spark truncates to µs, so the
      // oracle orders on integer epoch-µs exactly like the Spark side
      // (same ASOF semantics as DuckDB's ASOF JOIN, with a deterministic
      // event_id tiebreak).
      Some("""
        WITH ev AS (
          SELECT event_id, user_id, event_type,
                 CAST(epoch_ns(ts)//1000 AS BIGINT) AS us
          FROM events WHERE event_type IN ('purchase','click'))
        SELECT event_id AS purchase_id, click_id
        FROM (SELECT event_id, event_type,
                     last_value(CASE WHEN event_type='click' THEN event_id END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id
              FROM ev)
        WHERE event_type = 'purchase' AND click_id IS NOT NULL
        ORDER BY purchase_id"""),
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("event_id"), col("us"), col("user_id"), col("event_type"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("click_id",
            last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase" && col("click_id").isNotNull)
          .select(col("event_id").as("purchase_id"), col("click_id"))
          .orderBy(col("purchase_id"))
      }),

    // ----- grouping sets via CUBE (completes rollup/cube/grouping-sets
    // alongside q10's ROLLUP; same partial-aggregate shuffle shape) -----
    QuerySpec(
      "q15_cube_orders",
      Some("""
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(o_orderstatus, 'ALL') AS status,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS DOUBLE)/100.0 AS total_price
        FROM orders
        GROUP BY CUBE(o_orderpriority, o_orderstatus)
        ORDER BY priority, status"""),
      (s, dir) =>
        Tables.t(s, dir, "orders")
          .cube(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("total_price"))
          .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            col("n_orders"), col("total_price"))
          .orderBy(col("priority"), col("status"))),

    // ----- sketches: HyperLogLog++ distinct + approximate quantiles -----
    // Raw sketch values are algorithm-specific (DuckDB's approx_* uses
    // different sketches), so they can't be value-checked cross-engine.
    // Instead the query emits (a) the EXACT distinct count — integer,
    // bit-identical in both engines — and (b) booleans asserting each
    // sketch lands within ε of the exact answer computed in the same
    // single pass; the oracle pins the booleans to literal true, so a
    // sketch drifting past ε fails the hash check. The point remains the
    // single-pass, mergeable-partial shape — at 100 TB the sketches
    // replace exact distinct/percentile scans and ε is the accuracy
    // contract this gate row enforces.
    QuerySpec(
      "q16_sketches",
      Some("""
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS exact_orders,
               true AS hll_ok, true AS p50_ok, true AS p99_ok
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val epsHll = 0.05 // generous vs the sketch's rsd=0.01 below
        // The reference quantile is computed on a hash-SAMPLE (below), so ε
        // covers sketch error (rank ≤ n/10000 — negligible) PLUS sampling
        // error: with m sampled rows per group the sample quantile's rank
        // error is ~sqrt(q(1-q)/m); the adaptive modulus below keeps
        // m ≥ ~15k per group (or goes exact on small tables), so rank
        // error stays ≤ ~0.5% and the value error well inside 10%. ε=0.10
        // keeps wide headroom while still failing on any real sketch
        // regression (a broken sketch is off by far more than 10%).
        val epsQ = 0.10
        def within(approx: Column, exact: Column, eps: Double): Column =
          abs(approx.cast("double") - exact.cast("double")) <= lit(eps) * abs(exact.cast("double"))
        val li = Tables.t(s, dir, "lineitem").select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
        // countDistinct stays ALONE in its aggregate: the distinct rewrite
        // re-keys the first-level agg by (flag, orderkey), and any sketch
        // placed in the same agg would materialize one multi-KB buffer per
        // DISTINCT KEY (~GBs at bench scale) instead of one per flag.
        val distincts = li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
        val sketches = li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50a"),
            percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99a"))
          .join(distincts, "l_returnflag")
        // Reference quantiles by RANK (discrete quantile at ceil(q·m)) over
        // a DETERMINISTIC hash-sample — never a sort of the full fact
        // table. A full-table Window.partitionBy(flag) sort collapses the
        // whole table into |flags| sort partitions (the classic skewed-
        // shuffle scale-killer); sampling first bounds the sorted rows to
        // ~targetSample regardless of n, so the window cost stays constant
        // at any scale while the rank error only shrinks. The modulus is
        // derived from the memoized table row count (the catalog statistic
        // a warehouse already has) and floors at 1, so small tables get
        // the exact answer. xxhash64 of the row identity makes the sample
        // reproducible run-to-run and machine-to-machine.
        val targetSample = 50000L
        val sampleMod = math.max(1L, lineitemCount(s, dir) / targetSample)
        val sampled =
          if (sampleMod <= 1L) li
          else li.filter(
            pmod(xxhash64(col("l_orderkey"), col("l_extendedprice")), lit(sampleMod)) === 0)
        val wOrd = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
        val wAll = Window.partitionBy(col("l_returnflag"))
        val exacts = sampled
          .withColumn("rn", row_number().over(wOrd))
          .withColumn("cnt", count(lit(1)).over(wAll))
          .filter(col("rn") === ceil(lit(0.5) * col("cnt")) ||
            col("rn") === ceil(lit(0.99) * col("cnt")))
          .groupBy(col("l_returnflag"))
          .agg(min(when(col("rn") === ceil(lit(0.5) * col("cnt")), col("l_extendedprice"))).as("p50x"),
            min(when(col("rn") === ceil(lit(0.99) * col("cnt")), col("l_extendedprice"))).as("p99x"))
        sketches.join(exacts, "l_returnflag")
          .select(col("l_returnflag"),
            col("exact_orders"),
            within(col("approx_orders"), col("exact_orders"), epsHll).as("hll_ok"),
            within(col("p50a"), col("p50x"), epsQ).as("p50_ok"),
            within(col("p99a"), col("p99x"), epsQ).as("p99_ok"))
          .orderBy(col("l_returnflag"))
      },
      prepare = Some((s, dir) => { lineitemCount(s, dir); () })),

    // ----- generic as-of join OPERATOR (graft.operators.AsofJoin) -----
    // Same semantics class as q14 but through the reusable operator; ties
    // at equal times resolve right-side-first then greatest payload, which
    // the oracle mirrors with (us, side, click_id NULLS FIRST) ordering.
    QuerySpec(
      "q17_asof_operator",
      Some("""
        WITH ev AS (
          SELECT event_id, user_id, event_type,
                 CAST(epoch_ns(ts)//1000 AS BIGINT) AS us
          FROM events WHERE event_type IN ('purchase','click')),
             u AS (
          SELECT user_id, us,
                 CASE WHEN event_type='click' THEN 0 ELSE 1 END AS side,
                 CASE WHEN event_type='purchase' THEN event_id END AS purchase_id,
                 CASE WHEN event_type='click' THEN event_id END AS click_id
          FROM ev)
        SELECT purchase_id, click_id
        FROM (SELECT purchase_id, side,
                     last_value(click_id IGNORE NULLS) OVER (
                       PARTITION BY user_id
                       ORDER BY us, side, click_id ASC NULLS FIRST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id
              FROM u)
        WHERE side = 1 AND click_id IS NOT NULL
        ORDER BY purchase_id"""),
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "click"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"), col("us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("us").as("cus"))
        graft.operators.AsofJoin(purchases, clicks, "user_id", "us", "cus", Seq("click_id"))
          .filter(col("asof_click_id").isNotNull)
          .select(col("purchase_id"), col("asof_click_id").as("click_id"))
          .orderBy(col("purchase_id"))
      }),

    // ----- bucketed range join OPERATOR (graft.operators.RangeJoin) -----
    // Clicks within 10 minutes after each purchase: intervals explode to
    // overlapped buckets, equi-join on (user, bucket), exact containment
    // filter — never a nested-loop range join.
    QuerySpec(
      "q18_range_join",
      Some("""
        WITH ev AS (
          SELECT event_id, user_id, event_type,
                 CAST(epoch_ns(ts)//1000 AS BIGINT) AS us
          FROM events WHERE event_type IN ('purchase','click')),
             p AS (SELECT user_id, event_id AS purchase_id, us AS lo,
                          us + 600000000 AS hi FROM ev WHERE event_type='purchase'),
             c AS (SELECT user_id, event_id AS click_id, us FROM ev WHERE event_type='click')
        SELECT p.purchase_id, count(*) AS n_clicks,
               CAST(min(c.click_id) AS BIGINT) AS first_click
        FROM p JOIN c ON c.user_id = p.user_id AND p.lo <= c.us AND c.us < p.hi
        GROUP BY 1
        ORDER BY 1"""),
      (s, dir) => {
        val tenMinUs = 600000000L
        val ev = Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "click"))
        val intervals = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("us").as("lo"), (col("us") + tenMinUs).as("hi"))
        val points = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("us"))
        graft.operators.RangeJoin
          .pointInInterval(points, intervals, "user_id", "us", "lo", "hi", tenMinUs)
          .groupBy(col("purchase_id"))
          .agg(count(lit(1)).as("n_clicks"), min(col("click_id")).as("first_click"))
          .orderBy(col("purchase_id"))
      }),

    // ----- salted skew join OPERATOR (graft.operators.SkewJoin) -----
    // events.user_id has ~670 rows/key at sf0.1 (150 users, 100k events) —
    // the hot-key shape. The salted join spreads each key over 8 reducers;
    // the result is row-identical to the plain join, which is exactly what
    // the oracle computes.
    QuerySpec(
      "q19_skew_join",
      Some("""
        SELECT c.c_mktsegment AS segment,
               count(*) AS n_events,
               CAST(sum(CAST(round(e.value*100,0) AS BIGINT)) AS BIGINT) AS value_cents
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
        ORDER BY 1"""),
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("user_id"), col("value"))
        val c = Tables.t(s, dir, "customer")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        graft.operators.SkewJoin.saltedEquiJoin(e, c, "user_id", salts = 8)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_events"),
            sum(cents(col("value"))).as("value_cents"))
          .select(col("c_mktsegment").as("segment"), col("n_events"), col("value_cents"))
          .orderBy(col("segment"))
      }),

    // ----- semi-structured extraction (JSON metadata column) -----
    // Training-data tables carry per-row JSON metadata; the scan-stage op
    // is schema-on-read extraction (get_json_object → typed column) fused
    // into the same stage as the aggregation — the JSON never shuffles,
    // only the extracted long does. At 100 TB the alternative (a separate
    // parse-then-write pass) doubles the IO; this shape parses exactly
    // once per row inside WholeStageCodegen.
    QuerySpec(
      "q21_json_extract",
      Some("""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(k) AS BIGINT) AS k_sum,
               CAST(min(k) AS BIGINT) AS k_min,
               CAST(max(k) AS BIGINT) AS k_max,
               CAST(CAST(sum(k) AS BIGINT) AS DOUBLE) / count(*) AS k_avg
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY event_type
        ORDER BY event_type"""),
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("k")).as("k_sum"),
            min(col("k")).as("k_min"),
            max(col("k")).as("k_max"))
          .withColumn("k_avg", col("k_sum").cast("double") / col("n"))
          .orderBy(col("event_type"))),

    // ----- pivot (wide-format report over a low-cardinality dimension) -----
    // groupBy().pivot() with an EXPLICIT value list — no extra job to
    // discover the pivot domain, and the aggregation stays a single
    // hash-agg with `count/sum FILTER`-style branches per value (exactly
    // the plan the oracle's FILTER clauses describe). Revenue goes through
    // the integer-cents path; the single final division produces the
    // dollar doubles.
    QuerySpec(
      "q22_pivot",
      Some("""
        SELECT l_returnflag,
               CAST(count(*) FILTER (l_linestatus = 'F') AS BIGINT) AS f_lines,
               CAST(count(*) FILTER (l_linestatus = 'O') AS BIGINT) AS o_lines,
               CAST(coalesce(sum(CAST(round(l_extendedprice*100,0) AS BIGINT))
                             FILTER (l_linestatus = 'F'), 0) AS DOUBLE)/100.0 AS f_revenue,
               CAST(coalesce(sum(CAST(round(l_extendedprice*100,0) AS BIGINT))
                             FILTER (l_linestatus = 'O'), 0) AS DOUBLE)/100.0 AS o_revenue
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""),
      (s, dir) =>
        Tables.t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(count(lit(1)).as("lines"),
            coalesce(sum(cents(col("l_extendedprice"))), lit(0L)).as("revcents"))
          .select(col("l_returnflag"),
            col("F_lines").as("f_lines"), col("O_lines").as("o_lines"),
            (col("F_revcents").cast("double") / 100.0).as("f_revenue"),
            (col("O_revcents").cast("double") / 100.0).as("o_revenue"))
          .orderBy(col("l_returnflag"))),

    // ----- unpivot (melt): q22's inverse, wide metrics → long -----
    // Spark's native unpivot (an Expand node — each input row fans out to
    // one row per value column in the SAME stage, no shuffle and no
    // N-way union re-scan); the aggregate beneath stays one hash-agg in
    // exact cents. The oracle melts with an explicit metric×CASE cross.
    QuerySpec(
      "q23_unpivot",
      Some("""
        WITH w AS (SELECT l_returnflag,
                          CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS qty_cents,
                          CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS price_cents,
                          CAST(sum(CAST(round(l_discount*100,0) AS BIGINT)) AS BIGINT) AS disc_cents
                   FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, m.metric,
               CASE m.metric WHEN 'qty_cents' THEN qty_cents
                             WHEN 'price_cents' THEN price_cents
                             ELSE disc_cents END AS value
        FROM w, (SELECT unnest(['qty_cents','price_cents','disc_cents']) AS metric) m
        ORDER BY l_returnflag, metric"""),
      (s, dir) =>
        Tables.t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(sum(cents(col("l_quantity"))).as("qty_cents"),
            sum(cents(col("l_extendedprice"))).as("price_cents"),
            sum(cents(col("l_discount"))).as("disc_cents"))
          .unpivot(Array(col("l_returnflag")),
            Array(col("qty_cents"), col("price_cents"), col("disc_cents")),
            "metric", "value")
          .orderBy(col("l_returnflag"), col("metric"))),

    // ----- arbitrary GROUPING SETS (beyond rollup q10 / cube q15) -----
    // Two unrelated groupings computed in ONE pass: a single Expand node
    // fans each row to its grouping-set copies feeding one hash-agg —
    // the shape to prefer over the N-scan union-of-aggregates a naive
    // port would write (N× the input read at 100 TB). grouping() tags
    // disambiguate NULL-as-data from NULL-as-grouped-out.
    QuerySpec(
      "q24_grouping_sets",
      Some("""
        SELECT coalesce(l_returnflag, '') AS rf,
               coalesce(l_linestatus, '') AS ls,
               CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
               CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
               count(*) AS n,
               CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS price_cents
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY rf, ls"""),
      (s, dir) =>
        Tables.t(s, dir, "lineitem")
          .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
            col("l_returnflag"), col("l_linestatus"))
          .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
            grouping(col("l_linestatus")).cast("int").as("g_ls"),
            count(lit(1)).as("n"),
            sum(cents(col("l_extendedprice"))).as("price_cents"))
          .select(coalesce(col("l_returnflag"), lit("")).as("rf"),
            coalesce(col("l_linestatus"), lit("")).as("ls"),
            col("g_rf"), col("g_ls"), col("n"), col("price_cents"))
          .orderBy(col("rf"), col("ls"))),

    // ----- time-series resample + gap fill (carry-forward) -----
    // The missing analytics shape: regularize an irregular event stream
    // onto a daily grid. Per user, a day spine spans [first, last] active
    // day (sequence + explode off ONE tiny aggregate — never a
    // users×calendar cross join), a left join lands the real daily
    // aggregates on it, gaps take n = 0, and the last seen daily cents
    // carries forward (last_value IGNORE NULLS over an unbounded-
    // preceding window). Day arithmetic is integer epoch-days end to end.
    // Shuffles: one groupBy and one window, both keyed by user — the
    // spine join is broadcast-size per user and AQE-local.
    QuerySpec(
      "q25_gap_fill",
      Some("""
        WITH e AS (SELECT user_id,
                          (CAST(epoch_ns(ts)//1000 AS BIGINT)) // 86400000000 AS day_num,
                          CAST(round(value*100,0) AS BIGINT) AS cents
                   FROM events),
             daily AS (SELECT user_id, day_num, count(*) AS n,
                              CAST(sum(cents) AS BIGINT) AS cents
                       FROM e GROUP BY user_id, day_num),
             bounds AS (SELECT user_id, min(day_num) AS d0, max(day_num) AS d1
                        FROM daily GROUP BY user_id),
             spine AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day_num
                       FROM bounds)
        SELECT s.user_id, s.day_num,
               coalesce(daily.n, 0) AS n,
               last_value(daily.cents IGNORE NULLS)
                 OVER (PARTITION BY s.user_id ORDER BY s.day_num
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_filled
        FROM spine s LEFT JOIN daily USING (user_id, day_num)
        ORDER BY user_id, day_num"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.events(s, dir)
          .select(col("user_id"), expr("us div 86400000000").as("day_num"),
            cents(col("value")).as("c"))
        val daily = e.groupBy(col("user_id"), col("day_num"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("cents"))
        val spine = daily.groupBy(col("user_id"))
          .agg(min(col("day_num")).as("d0"), max(col("day_num")).as("d1"))
          .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day_num"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("user_id", "day_num"), "left")
          .select(col("user_id"), col("day_num"),
            coalesce(col("n"), lit(0L)).as("n"),
            last(col("cents"), ignoreNulls = true).over(w).as("cents_filled"))
          .orderBy(col("user_id"), col("day_num"))
      })
  )
}
