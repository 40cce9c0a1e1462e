package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{Det, Tables}
import graft.util.Det.{davg, dsum}

/** Relational/feature-prep operator suite over the TPC-H-ish star schema
  * (TESTDATA.md). Covers SURVEY.md §2.5's checklist: scans, projection /
  * filter with parquet pushdown, inner / outer / semi / anti joins
  * (broadcast where one side is a dimension table), hash aggregation,
  * window functions, sorts / top-k, set ops, rollup, scalar string / date /
  * math functions, and a scalar subquery.
  *
  * Scale notes (100 TB): every query here is a declarative DataFrame plan —
  * Catalyst pushes filters and projections into the parquet scan, dimension
  * joins are explicitly `broadcast(...)`, and fact-fact joins shuffle on
  * their join keys only after pre-aggregation where semantics allow. All
  * double aggregates go through [[graft.util.Det]] so results are
  * order-independent (exact decimal sums) — which is also what makes them
  * reproducible under AQE re-planning and speculative execution on a
  * cluster.
  */
object RelationalQueries {
  import Tables.t

  val queries: Seq[Q] = Seq(
    // ---- Q1: scan + filter + hash aggregate (TPC-H Q1 shape) ----
    Q.sql(
      "q1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
        |  ${Det.dsumSql("l_quantity")} AS sum_qty,
        |  ${Det.dsumSql("l_extendedprice")} AS sum_base_price,
        |  ${Det.dsumSql("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
        |  ${Det.dsumSql("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
        |  ${Det.davgSql("l_quantity")} AS avg_qty,
        |  ${Det.davgSql("l_discount")} AS avg_disc,
        |  count(*)::BIGINT AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      // spread AFTER the filter so the predicate still pushes into the scan;
      // the decimal-exact partial aggregation then runs on all cores
      // (Tables.spread is gated — a no-op on a many-split cluster scan)
      Tables.spread(
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- Q2: projection + filter; predicate/column pushdown to parquet ----
    Q.sql(
      "q2_filter_project",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
        |  AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-02-01 00:00:00").cast("timestamp") &&
          col("l_quantity") < 10)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- Q3: broadcast dim join + fact join + agg + top-k (TPC-H Q3) ----
    Q.sql(
      "q3_shipping_priority",
      s"""SELECT l_orderkey,
        |  ${Det.dsumSql("l_extendedprice*(1-l_discount)")} AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15 00:00:00").cast("timestamp"))
      // customer is SF-scaled — no broadcast hint; AQE picks the join
      // strategy from runtime sizes (broadcasts only when actually small)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select(
          col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- Q5: five-way join through the full star schema (TPC-H Q5) ----
    Q.sql(
      "q5_local_supplier_volume",
      s"""SELECT n_name,
        |  ${Det.dsumSql("l_extendedprice*(1-l_discount)")} AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
      // only the fixed-cardinality dims (nation: 25, region: 5) carry
      // broadcast hints; customer/supplier are SF-scaled → AQE decides
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup,
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- Q6: tight filter + global aggregate (TPC-H Q6) ----
    Q.sql(
      "q6_forecast_revenue",
      s"""SELECT ${Det.dsumSql("l_extendedprice*l_discount")} AS revenue,
        |  count(*)::BIGINT AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.04 AND 0.08
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.04, 0.08) &&
          col("l_quantity") < 24)
        .agg(
          dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // ---- window functions: row_number / lag / running sum ----
    Q.sql(
      "q7_window_running",
      """SELECT user_id, event_id,
        |  row_number() OVER w AS rn,
        |  lag(event_type, 1) OVER w AS prev_type,
        |  (sum(CAST(floor(value*1e9 + 0.5) AS BIGINT)::DECIMAL(38,0))
        |     OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE / 1e9
        |    AS running_value
        |FROM events
        |WHERE user_id < 50
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, rn""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .filter(col("user_id") < 50)
        .select(
          col("user_id"), col("event_id"),
          row_number().over(w).as("rn"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          // running sum on the Det floor-grid: a raw double running sum is
          // only tolerance-close to the oracle (order-sensitive last ulps);
          // the grid makes every prefix sum exact in both engines
          (sum(floor(col("value") * lit(1e9) + lit(0.5)).cast(DecimalType(38, 0)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double") / lit(1e9))
            .as("running_value"))
        .orderBy(col("user_id"), col("rn"))
    },

    // ---- sort + limit (top-k) ----
    Q.sql(
      "q8_topk_orders",
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },

    // ---- distinct + exact/approx cardinality ----
    Q.sql(
      "q9_distinct",
      """SELECT count(*)::BIGINT AS n_rows,
        |  count(DISTINCT l_partkey)::BIGINT AS n_parts,
        |  count(DISTINCT l_suppkey)::BIGINT AS n_supps,
        |  count(DISTINCT (l_partkey, l_suppkey))::BIGINT AS n_part_supp
        |FROM lineitem""".stripMargin) { (s, dir) =>
      // multi-distinct plans Expand (4 grouping sets → 4× rows), but the
      // distinct shuffle already fans out to shuffle.partitions — spreading
      // the scan first measured NET-NEGATIVE (the extra exchange costs more
      // than the map-side parallelism buys on a 2-column projection)
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"))
    },

    // ---- set operations: UNION / INTERSECT / EXCEPT ----
    Q.sql(
      "q10_setops",
      """WITH cn AS (SELECT DISTINCT c_nationkey AS k FROM customer),
        |     sn AS (SELECT DISTINCT s_nationkey AS k FROM supplier)
        |SELECT
        |  (SELECT count(*) FROM (SELECT k FROM cn UNION SELECT k FROM sn))::BIGINT AS n_union,
        |  (SELECT count(*) FROM (SELECT k FROM cn INTERSECT SELECT k FROM sn))::BIGINT AS n_intersect,
        |  (SELECT count(*) FROM (SELECT k FROM cn EXCEPT SELECT k FROM sn))::BIGINT AS n_except""".stripMargin) { (s, dir) =>
      // one LAZY plan: three aggregate subplans cross-joined (each 1 row),
      // executed in a single action — no eager driver-side counts, and
      // exchange reuse shares the two distinct scans across the branches
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("k")).distinct()
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("k")).distinct()
      val u = cn.union(sn).distinct().agg(count(lit(1)).as("n_union"))
      val i = cn.intersect(sn).agg(count(lit(1)).as("n_intersect"))
      val e = cn.except(sn).agg(count(lit(1)).as("n_except"))
      u.crossJoin(i).crossJoin(e)
    },

    // ---- semi / anti joins (EXISTS / NOT EXISTS) ----
    Q.sql(
      "q11_semi_anti",
      """SELECT
        |  (SELECT count(*) FROM customer WHERE EXISTS
        |     (SELECT 1 FROM orders WHERE o_custkey = c_custkey))::BIGINT AS n_with_orders,
        |  (SELECT count(*) FROM customer WHERE NOT EXISTS
        |     (SELECT 1 FROM orders WHERE o_custkey = c_custkey))::BIGINT AS n_without_orders""".stripMargin) { (s, dir) =>
      // single lazy plan (see q10): semi + anti branches cross-joined
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val withO = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_with_orders"))
      val withoutO = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_without_orders"))
      withO.crossJoin(withoutO)
    },

    // ---- left outer join preserving unmatched rows ----
    Q.sql(
      "q12_outer_join",
      s"""SELECT c_custkey, count(o_orderkey)::BIGINT AS n_orders,
        |  coalesce(${Det.dsumSql("o_totalprice")}, 0.0) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |WHERE c_custkey < 200
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer").filter(col("c_custkey") < 200)
      val ord = t(s, dir, "orders")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spend"))
        .orderBy("c_custkey")
    },

    // ---- group-by + HAVING ----
    Q.sql(
      "q13_having",
      s"""SELECT p_brand, count(*)::BIGINT AS n_parts,
        |  ${Det.dsumSql("p_retailprice")} AS sum_price
        |FROM part
        |GROUP BY p_brand
        |HAVING count(*) > 10
        |ORDER BY p_brand""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"), dsum(col("p_retailprice")).as("sum_price"))
        .filter(col("n_parts") > 10)
        .orderBy("p_brand")
    },

    // ---- conditional aggregation (CASE WHEN inside agg; TPC-H Q14 shape) ----
    Q.sql(
      "q14_promo_share",
      s"""SELECT
        |  ${Det.dsumSql("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END")}
        |    AS promo_revenue,
        |  ${Det.dsumSql("l_extendedprice*(1-l_discount)")} AS total_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem").filter(
        col("l_shipdate") >= lit("1997-06-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01 00:00:00").cast("timestamp"))
      val part = t(s, dir, "part")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      // part is SF-scaled — leave the join strategy to AQE
      li.join(part, col("l_partkey") === col("p_partkey"))
        .agg(
          dsum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0.0)))
            .as("promo_revenue"),
          dsum(rev).as("total_revenue"))
    },

    // ---- scalar string / date / math functions ----
    Q.sql(
      "q15_scalar_funcs",
      """SELECT o_orderkey,
        |  upper(o_orderpriority) AS prio_upper,
        |  substr(o_orderpriority, 1, 1) AS prio_code,
        |  length(o_orderstatus) AS status_len,
        |  concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
        |  year(o_orderdate)::INT AS order_year,
        |  month(o_orderdate)::INT AS order_month,
        |  round(sqrt(o_totalprice), 6) AS sqrt_price,
        |  round(ln(o_totalprice), 6) AS ln_price,
        |  abs(o_totalprice - 250000.0) AS dist_mid,
        |  CASE WHEN o_totalprice % 2 < 1 THEN 'even-ish' ELSE 'odd-ish' END AS parity
        |FROM orders WHERE o_orderkey < 100
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 100)
        .select(
          col("o_orderkey"),
          upper(col("o_orderpriority")).as("prio_upper"),
          substring(col("o_orderpriority"), 1, 1).as("prio_code"),
          length(col("o_orderstatus")).as("status_len"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_prio"),
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"),
          round(sqrt(col("o_totalprice")), 6).as("sqrt_price"),
          round(log(col("o_totalprice")), 6).as("ln_price"),
          abs(col("o_totalprice") - 250000.0).as("dist_mid"),
          when(col("o_totalprice") % 2 < 1, "even-ish").otherwise("odd-ish").as("parity"))
        .orderBy("o_orderkey")
    },

    // ---- rollup (hierarchical aggregation) ----
    Q.sql(
      "q16_rollup",
      s"""SELECT coalesce(r_name, 'ALL') AS region_name,
        |  coalesce(n_name, 'ALL') AS nation_name,
        |  count(*)::BIGINT AS n_customers,
        |  ${Det.dsumSql("c_acctbal")} AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      cust
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region_name"),
          coalesce(col("n_name"), lit("ALL")).as("nation_name"),
          col("n_customers"), col("sum_acctbal"))
        .orderBy("region_name", "nation_name")
    },

    // ---- scalar subquery in predicate ----
    Q.sql(
      "q17_above_avg_orders",
      s"""SELECT count(*)::BIGINT AS n_big_orders,
        |  ${Det.dsumSql("o_totalprice")} AS big_revenue
        |FROM orders
        |WHERE o_totalprice > 1.5 * (
        |  SELECT ${Det.davgSql("o_totalprice")}
        |  FROM orders)""".stripMargin) { (s, dir) =>
      val ord = t(s, dir, "orders")
      val avgDf = ord.agg(davg(col("o_totalprice")).as("avg_price"))
      ord.crossJoin(broadcast(avgDf))
        .filter(col("o_totalprice") > lit(1.5) * col("avg_price"))
        .agg(count(lit(1)).as("n_big_orders"), dsum(col("o_totalprice")).as("big_revenue"))
    },

    // ---- grouped aggregation over the events table (JSON + date funcs) ----
    Q.sql(
      "q18_events_profile",
      s"""SELECT event_type,
        |  count(*)::BIGINT AS n_events,
        |  count(DISTINCT user_id)::BIGINT AS n_users,
        |  ${Det.davgSql("value")} AS avg_value,
        |  min(value) AS min_value, max(value) AS max_value,
        |  (sum(regexp_extract(props, '"k": (\\d+)', 1)::BIGINT))::BIGINT AS sum_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          davg(col("value")).as("avg_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          // robust JSON path extraction (survives key order / whitespace),
          // value-equal to the oracle's regexp extraction
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
        .orderBy("event_type")
    })
}
