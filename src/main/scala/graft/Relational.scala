package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operators (SURVEY.md §2.1-2.4, §2.6-2.8): scan/filter,
  * hash aggregation, all join types, sort/limit, distinct, union, having,
  * OVER window functions, SLIMIT.
  *
  * Everything lowers to declarative DataFrame plans so Catalyst supplies
  * predicate pushdown, column pruning, partial aggregation, and join
  * strategy selection — the Spark equivalents of the reference's
  * planOptimizer.c rules (SURVEY §4.1).
  *
  * Determinism conventions (the driver hash-compares against DuckDB):
  *   - every query ends in a total ORDER BY over a unique key set;
  *   - order-sensitive double sums go through exact DECIMAL accumulation
  *     and only the final value is cast back to DOUBLE, so Spark's
  *     parallel (shuffled) sum and DuckDB's sequential sum agree bit-for-bit;
  *   - timestamps that carry sub-second precision are emitted as epoch-ms
  *     BIGINT to sidestep parquet ns/us truncation differences.
  */
object Relational {
  import Lowering._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- TableScan + filter pushdown (scanoperator.c / filter.c) ----
    "scan_filter_project" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    // ---- TableCountScan: count(*) answered from parquet footers ----
    "count_star" -> { (s, dir) =>
      Tables(s, dir, "lineitem").agg(count(lit(1)).as("n"))
    },
    // ---- HashAgg with group keys (aggregateoperator.c) — TPC-H Q1 ----
    "q1_agg" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumProd(col("l_extendedprice"), lit(1) - col("l_discount"))
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    // ---- agg with DISTINCT input ----
    "agg_distinct" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag"))
    },
    // ---- inner join + broadcast dim (hashjoinoperator.c) ----
    "join_inner" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      val n = broadcast(Tables(s, dir, "nation"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    },
    // ---- left outer join ----
    "join_left" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(coalesce(col("o_totalprice"), lit(0))).as("total_spent"))
        .orderBy(col("c_custkey"))
    },
    // ---- left semi join (EXISTS) ----
    "join_semi" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    // ---- left anti join (NOT EXISTS) ----
    "join_anti" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    // ---- full outer join (mergejoinoperator.c full) ----
    "join_full" -> { (s, dir) =>
      val byDayO = Tables(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).as("n_orders"))
      val byDayL = Tables(s, dir, "lineitem")
        .groupBy(col("l_shipdate").cast("date").as("d"))
        .agg(count(lit(1)).as("n_ships"))
      byDayO.join(byDayL, Seq("d"), "full")
        .select(col("d"), coalesce(col("n_orders"), lit(0)).as("n_orders"),
          coalesce(col("n_ships"), lit(0)).as("n_ships"))
        .orderBy(col("d"))
    },
    // ---- multi-way join (3 fact/dim hops) ----
    "join_multiway" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = broadcast(Tables(s, dir, "nation"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), col("o_orderpriority"))
        .agg(dsumProd(col("l_extendedprice"), lit(1) - col("l_discount"))
          .as("revenue"))
        .orderBy(col("n_name"), col("o_orderpriority"))
    },
    // ---- sort + limit (top-k, TakeOrderedAndProject) ----
    "sort_limit" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },
    // ---- limit with offset ----
    "limit_offset" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(5).limit(10)
    },
    // ---- DISTINCT (distinctfilteroperator.c) ----
    "distinct" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    // ---- UNION (distinct) / UNION ALL (sql.y:3095) ----
    "union_distinct" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val su = Tables(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.union(su).distinct().orderBy(col("nk"))
    },
    "union_all" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val su = Tables(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.union(su).groupBy(col("nk")).agg(count(lit(1)).as("n"))
        .orderBy(col("nk"))
    },
    // ---- HAVING (post-agg filter) ----
    "having" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .filter(col("n") >= 15)
        .orderBy(col("o_custkey"))
    },
    // ---- uncorrelated scalar subquery ----
    "subquery_scalar" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      // exact-decimal avg: a parallel double avg is order-sensitive and
      // could flip rows sitting on the threshold
      val avgPrice = o.agg(
        (dsum(col("o_totalprice")) / count(lit(1))).as("a"))
      o.join(broadcast(avgPrice), o("o_totalprice") > col("a") * 1.5)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    // ---- SQL window functions over ORDER BY frames (§2.6) ----
    "window_over" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
      Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 1000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          row_number().over(w).as("rn"),
          rank().over(Window.partitionBy(col("l_orderkey"))
            .orderBy(col("l_quantity"), col("l_linenumber"))).as("rk"),
          lag(col("l_quantity"), 1).over(w).as("prev_qty"),
          lead(col("l_quantity"), 1).over(w).as("next_qty"),
          first(col("l_quantity")).over(w).as("first_qty"),
          sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .as("running_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    // ---- full OVER frame surface (§2.6): dense/percent rank, cume,
    //      nth_value, fill_forward, duration RANGE frame ----
    "window_frames" -> { (s, dir) =>
      val e = Tables(s, dir, "events").filter(col("user_id") < 5)
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val wVal = Window.partitionBy(col("user_id")).orderBy(col("value"))
      val wRange = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rangeBetween(-3600000000L, 0L)
      val gapped = e.withColumn("v_n",
        when(col("event_id") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("value")))
      gapped.select(col("user_id"), Lowering.usToMs(col("ts")).as("ts_ms"),
          dense_rank().over(wVal).as("dr"),
          round(percent_rank().over(wVal), 6).as("pr"),
          round(cume_dist().over(wVal), 6).as("cd"),
          nth_value(col("value"), 2).over(wOrd).as("nth2"),
          last(col("v_n"), ignoreNulls = true).over(wOrd).as("ff"),
          sum(Lowering.dec(col("value"))).over(wRange).cast("double")
            .as("range_sum_1h"))
        .orderBy(col("user_id"), col("ts_ms"))
    },
    // ---- classic shipped-revenue 3-way join (TPC-H Q3 shape) ----
    "tpch_q3" -> { (s, dir) =>
      val cutoff = "1995-03-15"
      val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1.0) - col("l_discount")).cast(DecimalType(18, 2)))
      Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .join(Tables(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
        .join(Tables(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(rev).cast("double").as("revenue"))
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    // ---- local-supplier volume 6-way join (TPC-H Q5 shape) ----
    "tpch_q5" -> { (s, dir) =>
      val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1.0) - col("l_discount")).cast(DecimalType(18, 2)))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(Tables(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    // ---- SLIMIT: per-partition-group limit (sql.y:3111) ----
    "slimit_per_group" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    })

  def oracleSql: Map[String, String] = Map(
    "scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber""",
    "count_star" -> "SELECT count(*) AS n FROM lineitem",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
           round(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) / count(*), 6) AS avg_price,
           count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "join_inner" ->
      """SELECT n_name,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
           count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
           CAST(CAST(sum(CAST(coalesce(o_totalprice, 0) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "join_full" ->
      """SELECT coalesce(a.d, b.d) AS d,
           coalesce(n_orders, 0) AS n_orders, coalesce(n_ships, 0) AS n_ships
         FROM (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders
               FROM orders GROUP BY 1) a
         FULL JOIN (SELECT CAST(l_shipdate AS DATE) AS d, count(*) AS n_ships
               FROM lineitem GROUP BY 1) b ON a.d = b.d
         ORDER BY d""",
    "join_multiway" ->
      """SELECT n_name, o_orderpriority,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name, o_orderpriority ORDER BY n_name, o_orderpriority""",
    "sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5""",
    "distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "union_distinct" ->
      """SELECT nk FROM (
           SELECT c_nationkey AS nk FROM customer
           UNION SELECT s_nationkey AS nk FROM supplier) ORDER BY nk""",
    "union_all" ->
      """SELECT nk, count(*) AS n FROM (
           SELECT c_nationkey AS nk FROM customer
           UNION ALL SELECT s_nationkey AS nk FROM supplier)
         GROUP BY nk ORDER BY nk""",
    "having" ->
      """SELECT o_custkey, count(*) AS n,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
         FROM orders GROUP BY o_custkey HAVING count(*) >= 15
         ORDER BY o_custkey""",
    "subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice >
           (SELECT CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
              / count(*) FROM orders) * 1.5
         ORDER BY o_orderkey""",
    "window_over" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
           row_number() OVER w AS rn,
           rank() OVER (PARTITION BY l_orderkey
                        ORDER BY l_quantity, l_linenumber) AS rk,
           lag(l_quantity, 1) OVER w AS prev_qty,
           lead(l_quantity, 1) OVER w AS next_qty,
           first_value(l_quantity) OVER w AS first_qty,
           sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                 ROWS UNBOUNDED PRECEDING) AS running_qty
         FROM lineitem WHERE l_orderkey <= 1000
         WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
         ORDER BY l_orderkey, l_linenumber""",
    "slimit_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "window_frames" ->
      """WITH g AS (SELECT user_id, epoch_us(ts) AS t, value,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v_n
           FROM events WHERE user_id < 5)
         SELECT user_id, t // 1000 AS ts_ms,
           dense_rank() OVER wv AS dr,
           round(percent_rank() OVER wv, 6) AS pr,
           round(cume_dist() OVER wv, 6) AS cd,
           nth_value(value, 2) OVER wo AS nth2,
           last_value(v_n IGNORE NULLS) OVER wo AS ff,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER wr AS DECIMAL(18,2)) AS DOUBLE)
             AS range_sum_1h
         FROM g
         WINDOW wv AS (PARTITION BY user_id ORDER BY value),
           wo AS (PARTITION BY user_id ORDER BY t),
           wr AS (PARTITION BY user_id ORDER BY t
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, ts_ms""",
    "tpch_q3" ->
      """SELECT l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND o_orderkey = l_orderkey
           AND o_orderdate < TIMESTAMP '1995-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "tpch_q5" ->
      """SELECT n_name,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
         FROM lineitem, orders, customer, supplier, nation, region
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
         GROUP BY n_name ORDER BY revenue DESC, n_name""")
}

/** Shared lowering helpers: exact-decimal accumulation for hash-stable
  * double aggregates (see Relational's determinism conventions). */
object Lowering {
  /** Cast to an exact decimal so plus/times are associative across partitions. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-insensitive sum of a double column, returned as DOUBLE. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-insensitive sum of a product of two double columns: each factor
    * is rounded to cents once, the scale-4 products are summed exactly. */
  def dsumProd(a: Column, b: Column): Column = sum(dec(a) * dec(b)).cast("double")

  /** Order-insensitive average: exact decimal sum / count, rounded. */
  def davg(c: Column): Column =
    round(sum(dec(c)).cast("double") / count(c), 6)

  /** Long µs epoch → Long ms epoch without fp division: the subtraction
    * makes the value exactly divisible, so the double quotient is exact. */
  def usToMs(c: Column): Column =
    ((c - pmod(c, lit(1000L))) / lit(1000L)).cast(org.apache.spark.sql.types.LongType)
}
