package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sql.GraftSql

/** Queries expressed in the TDengine SQL dialect and lowered through
  * [[graft.sql.GraftSql]] — proving the text front end produces the
  * same oracle-exact plans as the DataFrame API. */
object Dialect {

  private val D = 86400000000L // 1d in µs
  private val H = 3600000000L // 1h in µs
  private val T0 = 1704067200000000L
  private val T5 = T0 + 5L * D
  // events query-range end (2024-01-31), matching TimeSeries.T1
  private val TEND = 1706659200000000L
  // INTERVAL(1d,6h) grid start covering T0: T0 is midnight-aligned, so
  // the first 6h-offset window containing it starts 18h earlier
  private val G6 = T0 - 18L * H

  private def run(s: SparkSession, dir: String, sql: String): DataFrame =
    GraftSql.query(s, name => Tables(s, dir, name), sql)

  /** Named views for the join dialect forms: event-type slices of
    * `events`, plus orders/customer with the join key renamed to one
    * shared name (the dialect's ON clause takes same-name equi keys). */
  private def views(s: SparkSession, dir: String): String => DataFrame = {
    case "purchases" => Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    case "clicks" => Tables(s, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    case "ords" => Tables(s, dir, "orders")
      .withColumnRenamed("o_custkey", "custkey")
    case "cust" => Tables(s, dir, "customer")
      .withColumnRenamed("c_custkey", "custkey")
    case other => Tables(s, dir, other)
  }

  /** State-window change-point oracle shared by the TRUE_FOR limit
    * variants — only the HAVING predicate differs per form. */
  private def stateTrueForOracle(having: String): String =
    s"""WITH t AS (SELECT user_id, epoch_us(ts) AS t, event_type,
          CASE WHEN lag(event_type) OVER w IS NULL
               OR lag(event_type) OVER w <> event_type
               THEN 1 ELSE 0 END AS chg
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (SELECT user_id, t, event_type,
          sum(chg) OVER (PARTITION BY user_id ORDER BY t
            ROWS UNBOUNDED PRECEDING) AS wid
          FROM t)
        SELECT user_id, min(event_type) AS state,
          min(t) // 1000 AS _wstart_ms, max(t) // 1000 AS _wend_ms,
          count(*) AS n
        FROM s GROUP BY user_id, wid
        HAVING $having
        ORDER BY user_id, _wstart_ms"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dialect_interval" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart, count(*) AS n, sum(value) AS sum_value
           FROM events INTERVAL(1h) ORDER BY _wstart""")
    },
    "dialect_partition_fill" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT user_id, _wstart, sum(value) AS v
            FROM events WHERE ts >= $T0 AND ts < $T5
            PARTITION BY user_id INTERVAL(1d) FILL(PREV)
            ORDER BY user_id, _wstart""")
    },
    // INTERVAL offset + FILL: the spine must sit on the SAME offset grid
    // as _wstart (filloperator.c:540) — the r3 all-null regression case
    "dialect_interval_offset_fill" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT user_id, _wstart, sum(value) AS v
            FROM events WHERE ts >= $T0 AND ts < $T5
            PARTITION BY user_id INTERVAL(1d,6h) FILL(PREV)
            ORDER BY user_id, _wstart""")
    },
    // forced fill over an empty range: NULL_F/VALUE_F still emit the full
    // spine with zero input rows (filloperator.c:220)
    "dialect_fill_value_f" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT _wstart, count(*) AS n
            FROM events WHERE ts >= ${T0 - 10 * D} AND ts < ${T0 - 5 * D}
            INTERVAL(1d) FILL(VALUE_F, 0)
            ORDER BY _wstart""")
    },
    // SLIMIT after a session window: slices 2-3 of the per-user
    // partitioning (SLIMIT counts SLICES, not rows — 20-select.md:665)
    "dialect_session_slimit" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, _wstart, _wend, count(*) AS n
           FROM events PARTITION BY user_id SESSION(ts, 30m)
           SLIMIT 2 SOFFSET 1
           ORDER BY user_id, _wstart""")
    },
    // LIMIT under PARTITION BY caps rows per slice (20-select.md:660):
    // first 2 sessions of every user
    "dialect_session_limit" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, _wstart, _wend, count(*) AS n
           FROM events PARTITION BY user_id SESSION(ts, 30m) LIMIT 2
           ORDER BY user_id, _wstart""")
    },
    // ns-precision gate (PRECISION 'ns', sql.y:923): events at ns
    // precision through the dialect with perSecond=1e9 — durations
    // scale to ns ticks and min/max ns values must survive end-to-end
    // (a µs truncation anywhere would zero the sub-µs digits). The
    // stored sub-µs digits are real but invisible to the oracle
    // (DuckDB truncates parquet ns to its µs timestamp on load), so
    // the fixture rebuilds them deterministically from event_id on the
    // µs-truncated base — both engines can compute that exactly.
    "ns_interval_gate" -> { (s, dir) =>
      val nsev = Tables.eventsAt(s, dir, 1000000000L)
        .withColumn("ts",
          expr("ts DIV 1000 * 1000") + col("event_id") % 1000)
      GraftSql.query(s,
        { case "events_ns" => nsev; case t => Tables(s, dir, t) },
        """SELECT _wstart AS _wstart_ns, count(*) AS n,
             min(ts) AS first_ns, max(ts) AS last_ns
           FROM events_ns INTERVAL(1h) ORDER BY _wstart_ns""",
        perSecond = 1000000000L)
    },
    // subquery in FROM (sql.y:3095-3100): session windows over a
    // filtered derived table, all in dialect text
    // IN (SELECT …) in WHERE lowers to a left-semi join; NOT IN to an
    // anti join with the SQL null guard (parTranslater.c)
    "dialect_in_subquery" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_id, user_id, value FROM events
           WHERE user_id IN (SELECT user_id FROM events
                             WHERE event_type = 'purchase' AND value > 95)
             AND event_type = 'click'
           ORDER BY event_id""")
    },
    "dialect_notin_subquery" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, count(*) AS n FROM events
           WHERE user_id NOT IN (SELECT user_id FROM events
                                 WHERE event_type = 'purchase'
                                   AND value > 99.5)
           GROUP BY user_id ORDER BY user_id""")
    },
    // MATCH / NMATCH regex operators (sql.y operator grammar;
    // filter.c regex eval) — rewritten to RLIKE before the expr leaf
    "dialect_match" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_id, event_type, user_id FROM events
           WHERE event_type MATCH '^(cl|pu)'
             AND event_type NMATCH 'ick$'
             AND user_id < 40
           ORDER BY event_id""")
    },
    // scalar subquery folded to a literal before planning (exact max,
    // so the DuckDB comparison is bit-stable)
    "dialect_scalar_subquery" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_id, user_id, value FROM events
           WHERE value >= (SELECT max(value) FROM events
                           WHERE event_type = 'view') - 0.5
           ORDER BY event_id""")
    },
    "dialect_subquery" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, _wstart, _wend, count(*) AS n
           FROM (SELECT user_id, ts FROM events
                 WHERE event_type = 'click') t
           PARTITION BY user_id SESSION(ts, 30m)
           ORDER BY user_id, _wstart""")
    },
    // two dialect levels: an outer GROUP BY over the inner INTERVAL
    // windows — the busiest hour's event count per user
    "dialect_subquery_agg" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, max(n) AS max_n
           FROM (SELECT user_id, count(*) AS n
                 FROM events PARTITION BY user_id INTERVAL(1h)) t
           GROUP BY user_id ORDER BY user_id""")
    },
    // STATE_WINDOW … EXTEND(1) in SQL text (sql.y:2938): null-state
    // rows merge into the previous window; the null-ing state expr is
    // an arbitrary CASE inside the clause parens
    "dialect_state_extend" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, min(_st) AS state,
             min(ts) DIV 1000 AS _wstart_ms, max(ts) DIV 1000 AS _wend_ms,
             count(*) AS n
           FROM events PARTITION BY user_id
           STATE_WINDOW(CASE WHEN value < 15 THEN NULL
                             ELSE event_type END)
           EXTEND(1)
           ORDER BY user_id, _wstart_ms""")
    },
    // STATE_WINDOW … ZEROTH_STATE('click') (sql.y:2905): baseline-state
    // windows filtered out entirely
    "dialect_state_zeroth" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, first(event_type) AS state,
             min(ts) DIV 1000 AS _wstart_ms, max(ts) DIV 1000 AS _wend_ms,
             count(*) AS n
           FROM events PARTITION BY user_id
           STATE_WINDOW(event_type) ZEROTH_STATE('click')
           ORDER BY user_id, _wstart_ms""")
    },
    // ANOMALY_WINDOW(value) (sql.y:2887) in SQL text — the z-score
    // Detector behind the same clause surface as the reference
    "dialect_anomaly" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, min(ts) DIV 1000 AS _wstart_ms,
             max(ts) DIV 1000 AS _wend_ms, count(*) AS n
           FROM events PARTITION BY user_id ANOMALY_WINDOW(value)
           ORDER BY user_id, _wstart_ms""")
    },
    // JSON tag operator `j->'key'` in SQL text, over a derived json
    // column built by a FROM subquery
    "dialect_json_tag" -> { (s, dir) =>
      run(s, dir,
        """SELECT c_custkey, j->'name' AS j_name, j->'seg' AS j_seg
           FROM (SELECT c_custkey,
                 concat('{"name":"', c_name, '","seg":"', c_mktsegment,
                   '"}') AS j
                 FROM customer WHERE c_custkey <= 500)
           ORDER BY c_custkey""")
    },
    // fill_forward(x) (builtins.c:8187, the §2.6 window-function
    // family): last non-null carried forward along the per-key ts
    // order — the indef-rows text spelling, like diff/csum
    "dialect_fill_forward" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, ts DIV 1000 AS ts_ms,
             fill_forward(CASE WHEN value < 15 THEN NULL
                          ELSE value END) AS ff
           FROM events PARTITION BY user_id
           ORDER BY user_id, ts_ms""")
    },
    // STATE_WINDOW in SQL text — same semantics (and oracle) as the
    // DataFrame-API state_window query
    "dialect_state_window" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, first(event_type) AS state,
             min(ts) DIV 1000 AS _wstart_ms, max(ts) DIV 1000 AS _wend_ms,
             count(*) AS n
           FROM events PARTITION BY user_id STATE_WINDOW(event_type)
           ORDER BY user_id, _wstart_ms""")
    },
    // STATE_WINDOW(e1, e2) (sql.y:2874 state_window_expr_list): the
    // window key is the TUPLE; bare state expressions may be selected
    "dialect_state_multi" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, min(ts) DIV 1000 AS _wstart_ms,
             max(ts) DIV 1000 AS _wend_ms, count(*) AS n,
             event_type, CAST(value > 50 AS INT) AS hi
           FROM events PARTITION BY user_id
           STATE_WINDOW(event_type, CAST(value > 50 AS INT))
           ORDER BY user_id, _wstart_ms""")
    },
    // EXTERNAL_WINDOW ( (subquery) w ) (sql.y:2895-2900): window set
    // from a subquery — here the 12h buckets where user 7 was active,
    // aggregating ALL rows that fall inside them
    "dialect_external_window" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart DIV 1000 AS ws_ms, _wend DIV 1000 AS we_ms,
             count(*) AS n
           FROM events EXTERNAL_WINDOW (
             (SELECT _wstart, _wend FROM events WHERE user_id = 7
              INTERVAL(12h)) w )
           ORDER BY ws_ms""")
    },
    // FILL over EXTERNAL_WINDOW (externalwindowoperator.c fill path;
    // 13-TimeSeriesExt/08-ExternalWindow/test_external_fill.py): empty
    // declared windows materialize with the positional fill values —
    // count(*) slots fill too; non-forced VALUE restricts to the
    // source's own data extent
    "dialect_external_fill" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart DIV 1000 AS ws_ms, count(*) AS n,
             sum(value) AS sv
           FROM events WHERE user_id = 3 EXTERNAL_WINDOW (
             (SELECT _wstart, _wend FROM events WHERE user_id = 7
              INTERVAL(12h)) w )
           FILL(VALUE, 0, -1)
           ORDER BY ws_ms""")
    },
    // calendar INTERVAL units (20-select.md v3.4.2): monthly buckets
    // are calendar-aligned, not fixed 30-day spans
    "dialect_interval_month" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, _wstart DIV 1000 AS ws_ms,
             _wend DIV 1000 AS we_ms, count(*) AS n
           FROM events PARTITION BY user_id INTERVAL(1n)
           ORDER BY user_id, ws_ms""")
    },
    // INTERVAL + SLIDING (hopping windows) in SQL text
    "dialect_interval_sliding" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart DIV 1000 AS _wstart_ms, count(*) AS n
           FROM events INTERVAL(10m) SLIDING(5m) ORDER BY _wstart_ms""")
    },
    // INTERP + FILL(NEAR) + SURROUND bound in SQL text
    "dialect_interp_surround" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT user_id, _irowts, interp(value) AS value, _isfilled
            FROM events PARTITION BY user_id
            RANGE($T0, $TEND) EVERY(12h) FILL(NEAR) SURROUND(1h, -1.0)""")
        .select(col("user_id"), expr("_irowts DIV 1000").as("_irowts_ms"),
          round(col("value"), 6).as("value"), col("_isfilled"))
        .orderBy(col("user_id"), col("_irowts_ms"))
    },
    // STATE_WINDOW + TRUE_FOR(2h): only windows lasting >= 2h survive
    "dialect_state_truefor" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, first(event_type) AS state,
             min(ts) DIV 1000 AS _wstart_ms, max(ts) DIV 1000 AS _wend_ms,
             count(*) AS n
           FROM events PARTITION BY user_id STATE_WINDOW(event_type)
           TRUE_FOR(2h)
           ORDER BY user_id, _wstart_ms""")
    },
    // TRUE_FOR limit variants (sql.y true_for_opt :3030-3032): COUNT n
    // keeps windows holding >= n rows; AND/OR combine with the duration
    "dialect_state_truefor_count" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, first(event_type) AS state,
             min(ts) DIV 1000 AS _wstart_ms, max(ts) DIV 1000 AS _wend_ms,
             count(*) AS n
           FROM events PARTITION BY user_id STATE_WINDOW(event_type)
           TRUE_FOR(COUNT 5)
           ORDER BY user_id, _wstart_ms""")
    },
    "dialect_state_truefor_and" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, first(event_type) AS state,
             min(ts) DIV 1000 AS _wstart_ms, max(ts) DIV 1000 AS _wend_ms,
             count(*) AS n
           FROM events PARTITION BY user_id STATE_WINDOW(event_type)
           TRUE_FOR(2h AND COUNT 5)
           ORDER BY user_id, _wstart_ms""")
    },
    "dialect_state_truefor_or" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, first(event_type) AS state,
             min(ts) DIV 1000 AS _wstart_ms, max(ts) DIV 1000 AS _wend_ms,
             count(*) AS n
           FROM events PARTITION BY user_id STATE_WINDOW(event_type)
           TRUE_FOR(2h OR COUNT 5)
           ORDER BY user_id, _wstart_ms""")
    },
    // EVENT_WINDOW + TRUE_FOR(1h)
    "dialect_event_truefor" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, _wstart DIV 1000 AS _wstart_ms,
             _wend DIV 1000 AS _wend_ms, count(*) AS n
           FROM events PARTITION BY user_id
           EVENT_WINDOW START WITH value > 90 END WITH value < 10
           TRUE_FOR(1h)
           ORDER BY user_id, _wstart_ms""")
    },
    // extended TRUE_FOR with START/END streak limits (sql.y
    // true_for_opt :3040-3060; eventwindowoperator.c:631-760): the
    // open backdates to the start streak's first row, the close lands
    // on the end streak's first row — oracle is an independently
    // generated pin (tools/gen_truefor_oracle.py)
    "dialect_event_truefor_limits" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, _wstart DIV 1000 AS _wstart_ms,
             _wend DIV 1000 AS _wend_ms, count(*) AS n
           FROM events WHERE user_id < 20 PARTITION BY user_id
           EVENT_WINDOW START WITH value > 70 END WITH value < 30
           TRUE_FOR(COUNT 2, START(COUNT 2), END(1h OR COUNT 2))
           ORDER BY user_id, _wstart_ms""")
    },
    // correlated scalar subqueries in the select list (equi and
    // non-equi correlation; Spark decorrelates natively — the
    // statement delegates whole to spark.sql via temp views)
    "dialect_correlated_subquery" -> { (s, dir) =>
      run(s, dir,
        """SELECT c_custkey,
             (SELECT count(*) FROM orders
              WHERE orders.o_custkey = customer.c_custkey) AS n_orders,
             (SELECT min(o_orderkey) FROM orders
              WHERE orders.o_custkey < customer.c_custkey) AS min_ok
           FROM customer WHERE c_custkey <= 50
           ORDER BY c_custkey""")
    },
    // keyless streak limits: ONE global machine over (ts, event_id)
    // via the two-pass GlobalScan fold — no PARTITION BY, no
    // single-partition collapse (eventwindowoperator.c:101 keyless)
    "dialect_event_truefor_keyless" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart DIV 1000 AS _wstart_ms,
             _wend DIV 1000 AS _wend_ms, count(*) AS n
           FROM events WHERE user_id < 20
           EVENT_WINDOW START WITH value > 70 END WITH value < 30
           TRUE_FOR(COUNT 2, START(COUNT 2), END(1h OR COUNT 2))
           ORDER BY _wstart_ms, _wend_ms, n""")
    },
    // COUNT_WINDOW(50) in SQL text
    "dialect_count_window" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, _wid, count(*) AS n,
             min(ts) DIV 1000 AS _wstart_ms, max(ts) DIV 1000 AS _wend_ms
           FROM events PARTITION BY user_id COUNT_WINDOW(50)
           ORDER BY user_id, _wid""")
    },
    // EVENT_WINDOW START WITH … END WITH … in SQL text
    "dialect_event_window" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, _wstart DIV 1000 AS _wstart_ms,
             _wend DIV 1000 AS _wend_ms, count(*) AS n,
             sum(value) AS sum_value
           FROM events PARTITION BY user_id
           EVENT_WINDOW START WITH value > 90 END WITH value < 10
           ORDER BY user_id, _wstart_ms""")
    },
    // INTERP + RANGE/EVERY/FILL in SQL text; the wrapper only converts
    // µs to ms and rounds, to line up with the shared oracle
    "dialect_interp" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT user_id, _irowts, interp(value) AS value, _isfilled
            FROM events PARTITION BY user_id
            RANGE($T0, $TEND) EVERY(12h) FILL(LINEAR)""")
        .select(col("user_id"), expr("_irowts DIV 1000").as("_irowts_ms"),
          round(col("value"), 6).as("value"), col("_isfilled"))
        .orderBy(col("user_id"), col("_irowts_ms"))
    },
    // ASOF JOIN in SQL text (sql.y:2766): newest click at-or-before
    // each purchase, lowered through JoinOps.asofJoin
    "dialect_asof_join" -> { (s, dir) =>
      GraftSql.query(s, views(s, dir),
        """SELECT user_id, ts DIV 1000 AS ts_ms, event_id,
             r_event_id AS click_event_id, r_value AS click_value
           FROM purchases ASOF JOIN clicks
           ON purchases.ts >= clicks.ts
             AND purchases.user_id = clicks.user_id
           ORDER BY user_id, ts_ms, event_id""")
    },
    // WINDOW JOIN … WINDOW_OFFSET (sql.y:2775): all clicks within
    // [-30m, +30m] of each purchase
    "dialect_window_join" -> { (s, dir) =>
      GraftSql.query(s, views(s, dir),
        """SELECT user_id, ts DIV 1000 AS ts_ms, event_id,
             r_event_id AS click_event_id, r_value AS click_value
           FROM purchases WINDOW JOIN clicks WINDOW_OFFSET(-30m, 30m)
           ON purchases.user_id = clicks.user_id
           ORDER BY user_id, ts_ms, event_id, click_event_id""")
    },
    // WINDOW JOIN implicit aggregation (25-join.md: aggregates in the
    // select list aggregate EACH preserved row's window set, no GROUP
    // BY written; count(*) counts window rows, so an empty window
    // yields 0)
    "dialect_window_join_agg" -> { (s, dir) =>
      GraftSql.query(s, views(s, dir),
        """SELECT user_id, ts DIV 1000 AS ts_ms, event_id,
             count(*) AS n, count(r_value) AS nv,
             CAST(CAST(sum(CAST(r_value AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS DOUBLE) AS sv
           FROM purchases WINDOW JOIN clicks WINDOW_OFFSET(-30m, 30m)
           ON purchases.user_id = clicks.user_id
           ORDER BY user_id, ts_ms, event_id""")
    },
    // plain equi JOIN in SQL text: orders enriched with their customer
    "dialect_inner_join" -> { (s, dir) =>
      GraftSql.query(s, views(s, dir),
        """SELECT custkey, o_orderkey, o_totalprice,
             r_c_name AS c_name, r_c_mktsegment AS c_mktsegment
           FROM ords JOIN cust ON ords.custkey = cust.custkey
           ORDER BY o_orderkey""")
    },
    // FORECAST(col, 'opts') text form routing to the TDgpt ops
    "dialect_forecast" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, _frowts,
             ROUND(FORECAST(value, 'algo=holtwinters,rows=3,
               start=1704067200000000,every=1d'), 6) AS forecast
           FROM events PARTITION BY user_id
           ORDER BY user_id, _frowts""")
    },
    // RIGHT JOIN keeps order-less customers (null order side); FULL
    // JOIN over disjoint event slices nulls both ways
    "dialect_right_join" -> { (s, dir) =>
      GraftSql.query(s, views(s, dir),
        """SELECT custkey, o_orderkey, o_totalprice, r_c_name AS c_name
           FROM ords RIGHT JOIN cust ON ords.custkey = cust.custkey
           ORDER BY custkey, o_orderkey""")
    },
    "dialect_full_join" -> { (s, dir) =>
      GraftSql.query(s, views(s, dir),
        """SELECT event_id, user_id, r_user_id, r_value
           FROM purchases FULL JOIN clicks
             ON purchases.event_id = clicks.event_id
           ORDER BY event_id""")
    },
    // LEFT SEMI / LEFT ANTI join text (sql.y:2726-2804 join_type)
    // with ON residual conjuncts — side-local pre-filter semantics
    "dialect_semi_join" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_id FROM events a
           LEFT SEMI JOIN events b
           ON a.user_id = b.user_id AND a.value > 50 AND b.value > 95
           ORDER BY event_id""")
    },
    "dialect_anti_join" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_id FROM events a
           LEFT ANTI JOIN events b
           ON a.user_id = b.user_id AND b.event_type = 'purchase'
              AND b.value > 99.9
           ORDER BY event_id""")
    },
    // per-row series functions under PARTITION BY (IndefRowsFunc in
    // SQL text): a row stream, not an aggregate
    "dialect_diff" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, ts DIV 1000 AS ts_ms, diff(value) AS diff_v
           FROM events PARTITION BY user_id ORDER BY user_id, ts_ms""")
    },
    "dialect_csum" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, ts DIV 1000 AS ts_ms, csum(value) AS csum
           FROM events PARTITION BY user_id ORDER BY user_id, ts_ms""")
    },
    "dialect_mavg" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, ts DIV 1000 AS ts_ms, mavg(value, 7) AS mavg
           FROM events PARTITION BY user_id ORDER BY user_id, ts_ms""")
    },
    // SELECT DISTINCT projection
    "dialect_distinct" -> { (s, dir) =>
      run(s, dir,
        """SELECT DISTINCT user_id, event_type FROM events
           ORDER BY user_id, event_type""")
    },
    // top-level UNION ALL with a union-level ORDER BY
    "dialect_union" -> { (s, dir) =>
      GraftSql.query(s, views(s, dir),
        """SELECT user_id, count(*) AS n, 'purchase' AS kind
           FROM purchases GROUP BY user_id
           UNION ALL
           SELECT user_id, count(*) AS n, 'click' AS kind
           FROM clicks GROUP BY user_id
           ORDER BY user_id, kind""")
    },
    // cols(selectFunc, out…) (builtins.c:6831): companion values at the
    // row a selection function picks — expands to max_by/min_by items.
    // event_id is unique, so the picked row is deterministic.
    "dialect_cols" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id,
             cols(max(event_id), ts DIV 1000 AS ts_at_max,
               value AS v_at_max),
             cols(min(event_id), ts DIV 1000 AS ts_at_min)
           FROM events PARTITION BY user_id ORDER BY user_id""")
    },
    // TDengine time scalars Spark spells differently (sclfunc.c:4870
    // timediff, 4076 to_iso8601, 5113 week family, 4954 timezone);
    // now()/today() exercise the WHERE rewrite path (trivially-true
    // bounds: the data is all in 2024, both engines evaluate at run
    // time years later)
    "dialect_scalar_time" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT event_id,
             timediff(ts, $T0, 1h) AS td_h,
             timediff($T0, ts, 1d) AS td_negd,
             timediff(ts, $T0) AS td_raw,
             to_iso8601(ts) AS iso,
             to_unixtimestamp(to_char(ts, 'YYYY-MM-DD HH24:MI:SS'))
               AS rt_us,
             week(ts) AS wk0, week(ts, 3) AS wk3,
             weekofyear(ts) AS woy, weekday(ts) AS wd,
             dayofweek(ts) AS dow, timezone() AS tz
           FROM events
           WHERE event_id < 2000 AND ts < now() AND ts < today()
           ORDER BY event_id""")
    },
    // timetruncate calendar units (1n/1q/1y) and the timezone-string
    // third arg (timeTruncateFunction): truncation happens on that
    // zone's wall clock, DST-aware — the January 2024 events cross the
    // NY quarter boundary at 05:00Z Jan 1, where Q4-2023 started under
    // EDT (-4) but Q1-2024 starts under EST (-5)
    "dialect_timetruncate_tz" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_id,
             timetruncate(ts, 1n) AS mon_utc,
             timetruncate(ts, 1q, 'America/New_York') AS q_ny,
             timetruncate(ts, 1d, 'Asia/Shanghai') AS d_sh
           FROM events WHERE event_id < 2000 ORDER BY event_id""")
    },
    // to_iso8601 timezone argument (sclfunc.c toISO8601Function):
    // fixed offsets shift the wall clock and keep the user's spelling
    // as the suffix; UTC-prefixed forms strip+pad; IANA names are
    // DST-aware with a computed ±HHMM suffix (events are all January
    // 2024, so New York is EST year-round here — deterministic)
    "dialect_iso8601_tz" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_id,
             to_iso8601(ts, 'Asia/Shanghai') AS iso_sh,
             to_iso8601(ts, 'America/New_York') AS iso_ny,
             to_iso8601(ts, '-05:30') AS iso_off,
             to_iso8601(ts, 'UTC+8') AS iso_utc8,
             to_iso8601(ts, 'z') AS iso_z
           FROM events WHERE event_id < 2000 ORDER BY event_id""")
    },
    // window functions through the text front end (builtins.c rank /
    // dense_rank / row_number / lag / lead / nth_value / percent_rank /
    // cume_dist): OVER (…) parses as a parenthesized span, so the
    // clause splitter never sees its PARTITION BY/ORDER BY, and the
    // expressions delegate to Spark's native window functions
    "dialect_over" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, ts DIV 1000 AS ts_ms, event_id,
             rank() OVER (PARTITION BY user_id
               ORDER BY value DESC, event_id) AS rk,
             dense_rank() OVER (PARTITION BY user_id
               ORDER BY value DESC, event_id) AS drk,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn,
             lag(value, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS lg,
             lead(value, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS ld,
             nth_value(value, 3) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS nth,
             round(percent_rank() OVER (PARTITION BY user_id
               ORDER BY value, event_id), 6) AS pr,
             round(cume_dist() OVER (PARTITION BY user_id
               ORDER BY value, event_id), 6) AS cd
           FROM events ORDER BY user_id, ts_ms, event_id""")
    },
    // approximate aggregates through the text surface: hyperloglog
    // (HLL++ estimate, pinned oracle — register maxima are order-
    // independent) and apercentile's registered t-digest UDAF judged
    // by the reference's error-bound contract
    "dialect_approx" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_type, hyperloglog(user_id) AS approx_users,
             (abs(apercentile(value, 50) - percentile(value, 50)) <=
               (max(value) - min(value)) * 0.05) AS ok50,
             count(*) AS n
           FROM events GROUP BY event_type ORDER BY event_type""")
    },
    // percentile(0-100 scale), population stddev, elapsed — the
    // TDengine aggregate spellings Spark spells differently
    // (builtins.c:3216 percentile, :3038 stddev=pop, elapsed)
    "dialect_agg_misc" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id,
             round(percentile(value, 90), 6) AS p90,
             round(stddev(value), 6) AS sd_pop,
             round(stddev_samp(value), 6) AS sd_samp,
             elapsed(ts) AS span_us,
             round(elapsed(ts, 1h), 6) AS span_h
           FROM events PARTITION BY user_id ORDER BY user_id""")
    },
    // query-range pseudo columns (builtins.c:5211-5249 _qstart/_qend/
    // _qduration; 20-select.md:292): the WHERE ts-range as inclusive
    // bounds, visible in the select list
    "dialect_qrange" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT _qstart AS qs, _qend AS qe, _qduration AS qd,
              count(*) AS n
            FROM events WHERE ts >= $T0 AND ts < $T5""")
    },
    // ORDER BY … [ASC|DESC] NULLS FIRST|LAST (sql.y
    // null_ordering_opt): non-default null placement
    "dialect_nulls_order" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_id,
             CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS v
           FROM events WHERE user_id < 5
           ORDER BY v ASC NULLS FIRST, event_id""")
    },
    // named windows — WINDOW w AS (…) (sql.y:3002-3015; resolved at
    // plan time by windowfuncoperator.c:1980): `OVER w` inlines to the
    // named spec before the expr() hand-off, incl. ROWS and duration
    // RANGE frames shared across select items
    "dialect_named_window" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, ts DIV 1000 AS ts_ms, event_id,
             rank() OVER w AS rk,
             max(value) OVER wrows AS mx4,
             count(*) OVER wrange AS cnt_1h,
             min(value) OVER wrange AS mn_1h
           FROM events WHERE user_id < 20
           WINDOW w AS (PARTITION BY user_id
               ORDER BY value DESC, event_id),
             wrows AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
             wrange AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
           ORDER BY user_id, ts_ms, event_id""")
    },
    // IMPUTATION text form (builtins.c imputation; clientTests.cpp:1150
    // `select imputation(a) from …`): gaps planted in a FROM subquery,
    // filled by the linear model, _improwts/_impmark pseudo-columns
    "dialect_imputation" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, _improwts DIV 1000 AS ts_ms, event_id,
             round(imputation(value), 6) AS value, _impmark
           FROM (SELECT user_id, ts, event_id,
                   CASE WHEN event_id % 7 = 0 THEN NULL
                        ELSE value END AS value
                 FROM events)
           PARTITION BY user_id
           ORDER BY user_id, ts_ms, event_id""")
    },
    // ANOMALYCHECK text form (builtins.c:7291, _anomalymark :7592):
    // per-row z-score verdicts over the per-user series
    "dialect_anomalycheck" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, ts DIV 1000 AS ts_ms, event_id,
             anomalycheck(value, 'z=2') AS value, _anomalymark
           FROM events PARTITION BY user_id
           ORDER BY user_id, ts_ms, event_id""")
    },
    // misc scalar spellings: truncate (decimalFn trunc-toward-zero),
    // CHAR code points, base64 pair, plus passthroughs TDengine and
    // Spark share (greatest/least/char_length/ascii/position/mod/sign)
    "dialect_scalar_misc" -> { (s, dir) =>
      run(s, dir,
        """SELECT c_custkey,
             truncate(c_acctbal * 1.7, 2) AS tr2,
             truncate(c_acctbal, 0) AS tr0,
             char(65 + c_custkey % 26, 97 + c_custkey % 26) AS ch2,
             to_base64(c_name) AS b64,
             from_base64(to_base64(c_name)) AS rt,
             greatest(c_custkey % 7, c_custkey % 5, 3) AS gt,
             least(c_custkey % 7, c_custkey % 5) AS lt,
             char_length(c_name) AS clen,
             ascii(c_name) AS asc_c,
             position('3' IN c_name) AS pos_c,
             mod(c_custkey, 7) AS md,
             sign(c_acctbal - 10) AS sg,
             sign(c_custkey - 250) AS sgi,
             md5(c_name) AS h
           FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""")
    },
    // string scalars the reference routes through sclfunc.c
    // (substring_index, find_in_set, repeat, replace, ltrim/rtrim) —
    // Spark shares every spelling natively; the oracle re-expresses
    // the MySQL-isms DuckDB spells differently
    "dialect_string_fns" -> { (s, dir) =>
      run(s, dir,
        """SELECT c_custkey,
             substring_index(c_name, '#', 1) AS si_head,
             substring_index(c_name, '#', -1) AS si_tail,
             find_in_set(c_mktsegment,
               'BUILDING,AUTOMOBILE,MACHINERY,HOUSEHOLD,FURNITURE')
               AS fis,
             repeat(substr(c_name, 1, 2), 3) AS rep,
             replace(c_name, 'Customer', 'Cust') AS repl,
             ltrim(concat('  ', c_name)) AS lt,
             rtrim(concat(c_name, '  ')) AS rt
           FROM customer WHERE c_custkey <= 40 ORDER BY c_custkey""")
    },
    // multi-column FILL: one VALUE literal per aggregate column
    // (sql.y fill_mode; tfill.c fills every result column)
    "dialect_fill_multi" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT _wstart, max(value) AS mx, min(value) AS mn
            FROM events WHERE ts >= $T0 AND ts < ${T0 + 31 * D}
              AND user_id = 3 AND event_type = 'purchase' AND value > 90
            INTERVAL(1d) FILL(VALUE, 1.5, 2.5)
            ORDER BY _wstart""")
    },
    // FILL with no WHERE ts-range: the fill span defaults to the
    // result's own first..last window (fillGetWindowRange)
    "dialect_fill_norange" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart, max(value) AS mx FROM events
           WHERE user_id = 3 AND event_type = 'purchase' AND value > 90
           INTERVAL(1d) FILL(PREV) ORDER BY _wstart""")
    },
    // FILL over a CALENDAR interval (INTERVAL 1n): month-boundary grid
    // enumerated from the query range; empty months fill — events are
    // all January 2024, so 4 of the 5 months are filled rows
    "dialect_fill_calendar" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart, count(*) AS n, max(value) AS mx FROM events
           WHERE ts >= '2023-11-01 00:00:00' AND ts < '2024-04-01 00:00:00'
           INTERVAL(1n) FILL(VALUE, 0, -1) ORDER BY _wstart""")
    },
    // FILL(VALUE, …) constant-expression entries: the reference folds
    // arithmetic at parse time and C-coerces strings/booleans
    // (taosStr2Double prefix parse; fill suites use `1 + 2`, `'1e1'`,
    // `true` as fill literals)
    "dialect_fill_value_expr" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT _wstart, max(value) AS mx, min(value) AS mn,
              count(value) AS cnt
            FROM events WHERE ts >= $T0 AND ts < ${T0 + 31 * D}
              AND user_id = 3 AND event_type = 'purchase' AND value > 90
            INTERVAL(1d) FILL(VALUE, 1 + 2, '1e1', true)
            ORDER BY _wstart""")
    },
    // multi-column INTERP: every interp(col) resamples at the same grid
    "dialect_interp_multi" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT user_id, _irowts, interp(value) AS v1,
              interp(event_id) AS v2
            FROM events PARTITION BY user_id
            RANGE($T0, $TEND) EVERY(12h) FILL(LINEAR)""")
        .select(col("user_id"), expr("_irowts DIV 1000").as("_irowts_ms"),
          round(col("v1"), 6).as("v1"), round(col("v2"), 6).as("v2"))
        .orderBy(col("user_id"), col("_irowts_ms"))
    },
    // FILL(NEAR, v1, v2): positional fill mode with per-column
    // fallback values (sql.y:2956-2957), paired with the
    // RANGE(point, around) single-point form — the fallback applies
    // when the nearest row sits farther than the around bound
    "dialect_interp_near_values" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT user_id, _irowts, interp(value) AS v1,
              interp(event_id) AS v2, _isfilled
            FROM events PARTITION BY user_id
            RANGE(${T0 + 37 * H + H / 2}, 1h) FILL(NEAR, -1, -2)""")
        .select(col("user_id"), expr("_irowts DIV 1000").as("_irowts_ms"),
          round(col("v1"), 6).as("v1"), round(col("v2"), 6).as("v2"),
          col("_isfilled"))
        .orderBy(col("user_id"))
    },
    // WEEK(ts, mode) all 8 MySQL-compatible modes (sclfunc.c:5073
    // calculateWeekNum; modes 1,2,4-7 lower to the native WeekNum
    // expression, 0/3 to pure SQL)
    "dialect_week_modes" -> { (s, dir) =>
      run(s, dir,
        """SELECT DISTINCT timetruncate(ts, 1d) AS day_us,
             week(ts) AS w0, week(ts, 1) AS w1, week(ts, 2) AS w2,
             week(ts, 3) AS w3, week(ts, 4) AS w4, week(ts, 5) AS w5,
             week(ts, 6) AS w6, week(ts, 7) AS w7
           FROM events ORDER BY day_us""")
    },
    // PARTITION BY with an expression/constant key and a plain column
    // select: rows pass through — partitions are slice context only
    // (test_partition.py `partition by f1, (1)`)
    "dialect_partition_const" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_id FROM events WHERE event_id < 100
           PARTITION BY user_id, (1) ORDER BY event_id""")
    },
    // ORDER BY may name an aggregate expression verbatim after GROUP BY
    "dialect_order_agg" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, count(*) AS n FROM events GROUP BY user_id
           ORDER BY count(*) DESC, user_id LIMIT 5""")
    },
    // hash scalars (builtins.c:6149 crc32, :7723-7786 sha family)
    "dialect_scalar_hash" -> { (s, dir) =>
      run(s, dir,
        """SELECT c_custkey, crc32(c_name) AS crc, sha1(c_name) AS s1,
             sha(c_name) AS s0, sha2(c_name, 256) AS s2, md5(c_name) AS h
           FROM customer WHERE c_custkey <= 20 ORDER BY c_custkey""")
    },
    // system-info scalars (builtins.c FUNC_MGT_SYSTEM_INFO_FUNC)
    "dialect_sysinfo" -> { (s, dir) =>
      run(s, dir,
        """SELECT r_regionkey, server_version() AS sv,
             client_version() AS cv, current_user() AS cu,
             user() AS usr, database() AS db,
             first_day_of_week() AS fdow
           FROM region ORDER BY r_regionkey""")
    },
    // row-producing selection functions in the text form: the rest of
    // the select list projects the kept rows (topbotoperator;
    // builtins.c:4431 tail, :4471 unique)
    "dialect_top" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, user_id, event_id, TOP(value, 3) AS v FROM events
           PARTITION BY user_id ORDER BY user_id, v DESC, ts, event_id""")
    },
    "dialect_tail" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, user_id, event_id, TAIL(value, 5, 2) AS v FROM events
           PARTITION BY user_id ORDER BY user_id, ts, event_id""")
    },
    "dialect_unique" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, UNIQUE(event_type) AS et, ts FROM events
           PARTITION BY user_id ORDER BY user_id, et""")
    },
    // std = POPULATION stddev alias (builtins.c:7389) — Spark's std
    // is sample, the same silent trap as bare stddev
    "dialect_std" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, round(std(value), 6) AS sd FROM events
           GROUP BY user_id ORDER BY user_id""")
    },
    // comma-join: FROM t1, t2 WHERE t1.k = t2.k (sql.y
    // table_reference_list) rewrites to the JOIN … ON path
    "dialect_comma_join" -> { (s, dir) =>
      GraftSql.query(s, views(s, dir),
        """SELECT custkey, o_orderkey, r_c_name AS c_name
           FROM ords o, cust c
           WHERE o.custkey = c.custkey AND o_totalprice > 260000
           ORDER BY custkey, o_orderkey""")
    },
    // calendar INTERVAL + fixed SLIDING (ttime.c:1640): epoch-aligned
    // 15d grid starts, each window spanning one calendar month
    "dialect_interval_cal_sliding" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart, count(*) AS n, sum(value) AS sv
           FROM events INTERVAL(1n) SLIDING(15d) ORDER BY _wstart""")
    },
    // multi-p percentile returns ONE "[v1, v2, …]" varchar with %.6lf
    // formatting (builtinsimpl.c:2106)
    "dialect_percentile_multi" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, percentile(value, 50, 90, 99) AS p
           FROM events GROUP BY user_id ORDER BY user_id""")
    },
    // statecount/stateduration text forms (builtins.c:4256/:4296)
    "dialect_statecount" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, user_id, statecount(value, 'GT', 50) AS sc
           FROM events PARTITION BY user_id ORDER BY user_id, ts""")
    },
    "dialect_stateduration" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, user_id, stateduration(value, 'LE', 50, 1h) AS sd
           FROM events PARTITION BY user_id ORDER BY user_id, ts""")
    },
    // keyless per-row series functions — NO partition key, the whole
    // scan is one ts-ordered series (projectoperator.c:676 keyless
    // IndefRowsFunc); routed through GlobalScan.twoPass, never a
    // single-partition window
    "dialect_keyless_series" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, diff(value) AS d, csum(value) AS cs,
             mavg(value, 4) AS ma, fill_forward(value) AS ff
           FROM events WHERE user_id = 3 ORDER BY ts""")
    },
    // keyless TOP: global top-k lowers to sort-limit (TakeOrdered —
    // parallel partial top-k per partition), not a one-partition window
    "dialect_keyless_top" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, top(value, 5) AS v FROM events
           ORDER BY v DESC, ts""")
    },
    // keyless statecount: one global run-length series via the
    // two-pass fold
    "dialect_keyless_statecount" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, statecount(value, 'GT', 50) AS sc FROM events
           WHERE user_id = 5 ORDER BY ts""")
    },
    // LAG/LEAD pipeline set functions (22-function.md): positional
    // carry along ts, optional default
    "dialect_lag_lead" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, user_id, lag(value, 2, -1.5) AS lv,
             lead(value) AS nv
           FROM events PARTITION BY user_id ORDER BY user_id, ts""")
    },
    // keyless LEAD = lag over the reversed order: a second two-pass
    // scan, still no single-partition window
    "dialect_keyless_lag_lead" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, lead(value) AS nv, lag(value, 1) AS pv
           FROM events WHERE user_id = 7 ORDER BY ts""")
    },
    // DERIVATIVE(col, interval, ignore_negative) (builtins.c:3603):
    // slope per `interval`; ignore_negative=1 drops negative-slope rows
    "dialect_derivative" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, user_id, derivative(value, 1s, 1) AS dv
           FROM events PARTITION BY user_id ORDER BY user_id, ts""")
    },
    // ORDER BY a partition key that is NOT in the select list
    // (pervasive in the reference suite: `… PARTITION BY tbname …
    // ORDER BY tbname`): the key rides hidden through the projection
    "dialect_order_hidden_key" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart, count(*) AS n FROM events
           PARTITION BY user_id INTERVAL(1d)
           ORDER BY user_id, _wstart""")
    },
    // OVER windows next to bare columns (docs 10-function.md example
    // shape): the window must not resolve against the projected alias
    "dialect_over_bare_cols" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, value, row_number() OVER
             (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
           FROM events WHERE user_id <= 2 ORDER BY user_id, rn""")
    },
    // FORECAST with no start=/every= (the documented default): cadence
    // inferred from the series — every = mean spacing floored to whole
    // seconds, start = last ts + every
    "dialect_forecast_default" -> { (s, dir) =>
      run(s, dir,
        """SELECT _frowts, ROUND(FORECAST(value, 'algo=linear'), 6)
             AS fc
           FROM events WHERE user_id = 2 ORDER BY _frowts""")
    },
    // star select under PARTITION BY: rows pass through, LIMIT caps
    // rows PER SHARD in ts order (20-select.md:141)
    "dialect_partition_star_limit" -> { (s, dir) =>
      run(s, dir,
        """SELECT * FROM events PARTITION BY user_id LIMIT 2
           ORDER BY user_id, event_id""")
    },
    // COUNT_WINDOW(n, sliding) text form: overlapping row windows
    // every `sliding` rows
    "dialect_count_window_sliding" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, _wstart, _wend, count(*) AS n FROM events
           PARTITION BY user_id COUNT_WINDOW(50, 25)
           ORDER BY user_id, _wstart, _wend""")
    },
    // COUNT_WINDOW(n, sliding, cols): overlapping row windows over
    // only the rows whose col-args are non-null (sql.y:2984-2987
    // count_window_args 4-arg form)
    "dialect_count_window_slide_cols" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, _wstart, _wend, count(*) AS n FROM events
           PARTITION BY user_id
           COUNT_WINDOW(50, 25, nullif(event_type, 'view'))
           ORDER BY user_id, _wstart, _wend""")
    },
    // cols(selector, *) expands the star to every table column, and
    // un-aliased expression outputs auto-name (parTranslater
    // rewriteColsFunction)
    "dialect_cols_star" -> { (s, dir) =>
      run(s, dir,
        """SELECT cols(max(event_id), *),
             cols(max(event_id), length(event_type) + 1)
           FROM events WHERE event_id < 5000""")
    },
    // chained 3-table join (TPC-H-shaped reference tests): whole
    // statement delegates to Spark SQL over temp views
    "dialect_chain_join" -> { (s, dir) =>
      run(s, dir,
        """SELECT a.event_id AS id, b.value AS v2, c.value AS v3
           FROM events a JOIN events b ON a.event_id = b.event_id
             JOIN events c ON b.event_id = c.event_id
           WHERE a.user_id = 8 ORDER BY id""")
    },
    // 3-table comma join with WHERE equi conditions
    "dialect_comma_join3" -> { (s, dir) =>
      run(s, dir,
        """SELECT a.event_id AS id, b.value AS v2, c.value AS v3
           FROM events a, events b, events c
           WHERE a.event_id = b.event_id AND b.event_id = c.event_id
             AND a.user_id = 9
           ORDER BY id""")
    },
    // window PROJECTION mode (24-distinguished.md v3.4.2): a base
    // column in the select list makes each window emit ALL its rows,
    // with _wstart/_wend computed rowwise
    "dialect_window_projection" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart, _wend, ts AS tsu, event_id,
             round(value, 6) AS v
           FROM events WHERE user_id = 5 INTERVAL(1h)
           ORDER BY event_id""")
    },
    // the SCALAR keyword forces projection in the ambiguous
    // (pseudo/key-only) case; default would be one row per window
    "dialect_window_mode_scalar" -> { (s, dir) =>
      run(s, dir,
        """SELECT SCALAR _wstart, user_id FROM events
           PARTITION BY user_id INTERVAL(1d)
           ORDER BY user_id, _wstart""")
    },
    // ambiguous case default: aggregation mode, one row per window
    "dialect_window_mode_agg" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart, user_id FROM events
           PARTITION BY user_id INTERVAL(1d)
           ORDER BY user_id, _wstart""")
    },
    // ON-less INNER JOIN keyed through WHERE (parTranslater treats
    // `a JOIN b WHERE a.k = b.k` exactly like the comma form)
    "dialect_join_noon" -> { (s, dir) =>
      run(s, dir,
        """SELECT a.event_id AS id, b.value AS v2
           FROM events a JOIN events b
           WHERE a.event_id = b.event_id AND a.user_id = 7
           ORDER BY id""")
    },
    // INTERVAL(d, AUTO) (sql.y:2883, ttime.c:1732 v3.3.5+): the
    // window grid aligns to the WHERE clause's ts lower bound
    "dialect_interval_auto" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart, count(*) AS n FROM events
           WHERE ts >= 1704070000000000 INTERVAL(1h, AUTO)
           ORDER BY _wstart""")
    },
    // star accompaniment: `SELECT *, max(k)` expands * to the
    // selected row's columns (20-select.md selection-function
    // accompaniment; the anchor row is the max-event_id row)
    "dialect_star_accompany" -> { (s, dir) =>
      run(s, dir,
        "SELECT *, max(event_id) AS me FROM events WHERE user_id = 3")
    },
    // selection function + bare accompanying columns
    // (test_orderby_basic.py `SELECT last(ts), ts FROM t1`): the bare
    // columns read from the selected row
    "dialect_select_accompany" -> { (s, dir) =>
      run(s, dir,
        """SELECT max(event_id) AS me, user_id, value
           FROM events WHERE user_id = 2""")
    },
    // calendar INTERVAL with a fixed-duration offset (taosTimeTruncate
    // offset step): every month boundary shifts by 7d
    "dialect_cal_interval_offset" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart, count(*) AS n FROM events
           INTERVAL(1n, 1w) ORDER BY _wstart""")
    },
    // PARTITION BY with a key-only select list: rows pass through;
    // SLIMIT caps slices (ordered by key), LIMIT caps rows per slice
    "dialect_partition_rows_slimit" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id FROM events PARTITION BY user_id
           HAVING user_id > 5 SLIMIT 2 LIMIT 3 ORDER BY user_id""")
    },
    // GROUP BY key-only select collapses to one row per group;
    // SLIMIT o,n slices the ordered group list
    "dialect_group_slimit" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_type AS tn FROM events GROUP BY event_type
           SLIMIT 1,2 ORDER BY tn""")
    },
    // cols() INSIDE a window query (rewriteColsFunction under
    // interval windows — keep_order corpus shapes): the selected-row
    // outputs evaluate per window
    "dialect_cols_window" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart AS w, cols(last(ts), ts AS lts, value AS lv)
           FROM events WHERE user_id = 3 INTERVAL(1d) ORDER BY w""")
    },
    // a SELECTION function carrying scalar columns without GROUP BY
    // (parTranslater selection semantics: the scalar items evaluate
    // ON THE SELECTED ROW — `select abs(c1), max(c1) from stb1`)
    "dialect_selection_row" -> { (s, dir) =>
      run(s, dir,
        """SELECT abs(value) AS av, round(value / 2, 3) AS hv,
             max(value) AS mx, user_id AS u
           FROM events WHERE event_id <= 5000""")
    },
    "dialect_selection_row_partition" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, first(value) AS fv, abs(value) AS av
           FROM events PARTITION BY user_id ORDER BY user_id""")
    },
    // double-quoted string literals — the reference lexer treats "…"
    // exactly like '…' (both TK_STRING; identifiers use backticks), so
    // datetime ranges and string comparisons accept either spelling
    // (test_fun_agg_elapsed.py:1634 positive queries)
    "dialect_dquote_literals" -> { (s, dir) =>
      run(s, dir,
        """SELECT count(*) AS n,
             count(CASE WHEN event_type = "view" THEN 1 END) AS nv
           FROM events WHERE ts >= "2024-01-05 00:00:00.000"
             AND ts < "2024-01-12 00:00:00.000"""")
    },
    // ORDER BY naming the selection aggregate, with `*` riding along
    // (test_normal.py:247 `select *, last(ts) + 2 from stb order by
    // last(ts) desc` = checkRows(1)): the call collapses to its value
    // on the selected row
    "dialect_selection_order_agg" -> { (s, dir) =>
      run(s, dir,
        "SELECT *, last(ts) + 2 AS lt FROM events ORDER BY last(ts) DESC")
    },
    // last_row(*) star-expansion riding bare columns and constants
    // (test_fun_select_last_row.py:243 `select last_row(*),ts,'k'`)
    "dialect_last_row_ride" -> { (s, dir) =>
      run(s, dir, "SELECT last_row(*), ts, 'k' AS k FROM events")
    },
    // PARTITION BY ordinal + aggregate HAVING without aggregates in
    // the select list collapses to one row per partition
    // (test_query_partitionby_basic.py:598,660)
    "dialect_partition_having" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_type FROM events PARTITION BY 1
           HAVING count(*) >= 0 ORDER BY event_type""")
    },
    // calendar INTERVAL with a fixed-duration offset AND SLIDING
    // (test_interval_basic.py:293 `interval(1n, 1w) sliding(2w)`):
    // window starts sit on the epoch-aligned sliding grid + offset,
    // each spanning one calendar month
    "dialect_cal_offset_sliding" -> { (s, dir) =>
      run(s, dir,
        """SELECT CAST(_wstart AS BIGINT) AS w, count(*) AS n
           FROM events INTERVAL(1n, 1w) SLIDING(2w) ORDER BY w""")
    },
    // quantified subquery comparisons (test_quantified_sub3/4.py):
    // ordering ops fold against the subquery min/max; = ANY routes
    // through the IN semi-join
    "dialect_quantified_subq" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_id FROM events
           WHERE value > ALL (SELECT value FROM events WHERE event_id <= 3)
             AND user_id = ANY (SELECT user_id FROM events
                                WHERE event_id <= 200)
           ORDER BY event_id""")
    },
    // SLIMIT with the partition key ABSENT from the select list
    // (test_ts_partitonby.py:108): the slice applies pre-projection
    "dialect_slimit_nokey" -> { (s, dir) =>
      run(s, dir,
        """SELECT count(*) AS n FROM (SELECT ts FROM events
           WHERE ts IS NOT NULL PARTITION BY user_id SLIMIT 2)""")
    },
    // an ASOF join chained into a further regular join
    // (test_join_full.py:6527): the special join plans first, the
    // chain delegates to Spark SQL over its flattened output
    "dialect_sjoin_chain" -> { (s, dir) =>
      run(s, dir,
        """SELECT a.ts FROM (events a LEFT ASOF JOIN events b)
           JOIN events c ON b.ts = c.ts ORDER BY 1 LIMIT 20""")
    },
    // WINDOW JOIN keyed by matching JSON-tag expressions
    // (test_join_full.py:10481 `on a.t->'tag1' = b.t->'tag1'`):
    // the expression materializes as a synthetic key on both sides
    "dialect_window_join_json_key" -> { (s, dir) =>
      run(s, dir,
        """SELECT a.ts, count(b.value) AS n
           FROM events a LEFT WINDOW JOIN events b
             ON a.user_id = b.user_id AND a.props->'k' = b.props->'k'
             WINDOW_OFFSET(0s, 30s)
           ORDER BY a.ts""")
    },
    // indefinite-rows functions per COUNT_WINDOW with real pseudo-cols
    // (test_fun_win_keep_order.py `statecount(voltage,'LE',223) …
    // count_window(3)`): the function resets at each n-row bucket;
    // _wstart/_wend are the bucket's min/max ts
    "dialect_indef_count_window" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, CAST(_wstart AS BIGINT) AS w,
             CAST(_wduration AS BIGINT) AS wd,
             statecount(value, 'LE', 50) AS sc
           FROM events WHERE user_id = 3 COUNT_WINDOW(3)
           ORDER BY ts""")
    },
    // indefinite-rows functions per SESSION window
    // (test_interval_basic.py:1224 `derivative(k, 6m, 1) from tm0
    // session(ts, 1s)` positive): the function resets at each
    // session boundary
    "dialect_indef_session" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, CAST(_wstart AS BIGINT) AS w,
             csum(event_id) AS cs FROM events
           WHERE user_id = 3 SESSION(ts, 10m) ORDER BY ts""")
    },
    // to_timestamp with a NON-LITERAL format argument
    // (test_fun_sca_to_timestamp.py:163 `to_timestamp(c8, c9)`):
    // Postgres-style tokens translate rowwise
    "dialect_to_timestamp_col" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_id, to_timestamp('2025-03-04 15:06:07.123',
             concat('YYYY-MM-DD ', 'HH24:MI:SS.MS')) AS t
           FROM events WHERE event_id < 5 ORDER BY event_id""")
    },
    // indefinite-rows functions PER INTERVAL WINDOW with FILL
    // (test_fun_ts_interval_fill.py, "Since: 3.4.1.0"): csum resets at
    // each window boundary; empty-output windows in the query range
    // fill one row with the VALUE literal
    "dialect_indef_interval_fill" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, CAST(_wstart AS BIGINT) AS w,
             csum(event_id) AS cs
           FROM events
           WHERE ts >= 1704067200000000 AND ts < 1704326400000000
           PARTITION BY user_id INTERVAL(6h) FILL(VALUE, 0)
           ORDER BY user_id, w, cs""")
    },
    // SLIMIT after an AGGREGATE GROUP BY (sql.y:3111-3114 attaches
    // slimit_clause_opt to any partitioned query; 27 streams-corpus
    // hits of `… group by k … order by k slimit n limit m`): the GROUP
    // BY keys are the slice identity when there is no PARTITION BY
    "dialect_slimit_groupby" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id, count(*) AS n,
             CAST(sum(event_id) AS BIGINT) AS se
           FROM events GROUP BY user_id ORDER BY user_id SLIMIT 1, 3""")
    },
    // a window clause under a plain projection returns the raw rows
    // (test_session.py `select * from dev_001 session(ts,1w)`)
    "dialect_session_raw" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, event_id, value FROM events WHERE user_id = 5
           SESSION(ts, 10m) ORDER BY event_id""")
    },
    // INTERP FILL(VALUE, v1, v2): positional per-column literals
    "dialect_interp_value_multi" -> { (s, dir) =>
      run(s, dir,
        """SELECT _irowts, interp(value) AS v1, interp(user_id) AS v2
           FROM events
           RANGE(1704067200000000, 1704070200000000) EVERY(10m)
           FILL(VALUE, 10, 20) ORDER BY _irowts""")
    },
    // ns-unit durations (`b`, taosParseTime TIME_UNIT_NANO) in SLIDING
    "dialect_sliding_ns_unit" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart, count(*) AS n FROM events
           WHERE user_id = 3 INTERVAL(1d) SLIDING(43200000000000b)
           ORDER BY _wstart""")
    },
    // outer join with non-equi ON residuals (test_join_boundary.py):
    // residuals join as MATCH conditions, never post-filters
    "dialect_join_residual" -> { (s, dir) =>
      run(s, dir,
        """SELECT t1.ts, t1.event_id, t2.value AS v2
           FROM events t1 LEFT JOIN events t2
             ON t1.event_id = t2.event_id AND t2.value > 50
           WHERE t1.user_id = 3 ORDER BY t1.event_id""")
    },
    // ANTI JOIN residual: a right-side conjunct shrinks the match set,
    // KEEPING more left rows
    "dialect_anti_residual" -> { (s, dir) =>
      run(s, dir,
        """SELECT count(*) AS n
           FROM events t1 LEFT ANTI JOIN events t2
             ON t1.event_id = t2.event_id AND t2.value > 50""")
    },
    // FULL JOIN with residual: right-qualified refs read NULL on
    // unmatched rows (r_-side fidelity), matched pairs obey the
    // residual
    "dialect_full_join_residual" -> { (s, dir) =>
      run(s, dir,
        """SELECT t2.event_id AS id2, t2.value AS v2, t1.value AS v1
           FROM events t1 FULL JOIN events t2
             ON t1.event_id = t2.event_id
               AND t2.value > 50 AND t1.value > 50
           WHERE t1.user_id = 6 OR t2.user_id = 6
           ORDER BY id2 NULLS FIRST, v1 NULLS FIRST""")
    },
    // derived-table join + qualified star (test_join.py nested forms)
    "dialect_subquery_join" -> { (s, dir) =>
      run(s, dir,
        """SELECT a.*, b.n2 AS n2
           FROM (SELECT event_type, count(*) AS n1 FROM events
                 WHERE user_id = 1 GROUP BY event_type) a
           JOIN (SELECT event_type, count(*) AS n2 FROM events
                 WHERE user_id = 2 GROUP BY event_type) b
             ON a.event_type = b.event_type
           ORDER BY a.event_type""")
    },
    // WINDOW JOIN canonical clause order (sql.y:2775): ON before
    // WINDOW_OFFSET, JLIMIT capping matches per left row
    "dialect_window_join_onfirst" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, event_id, b.value AS v2
           FROM events a LEFT WINDOW JOIN events b ON a.user_id = b.user_id
           WINDOW_OFFSET(-5s, 5s) JLIMIT 2
           WHERE user_id = 4
           ORDER BY event_id, v2 NULLS FIRST""")
    },
    // FROM-less SELECT (11-Functions/09-NoFrom/test_fun_no_from_all
    // .py): scalar + one-row-aggregate items, one output row
    "dialect_fromless" -> { (s, dir) =>
      run(s, dir,
        """SELECT server_version() AS sv, database() AS db,
             1+1 AS s, char(65) AS c, mod(10, 3) AS m,
             CAST(position('b' in 'abc') AS BIGINT) AS p,
             round(pi(), 6) AS pie, CAST(abs(-3.5) AS DOUBLE) AS a,
             count(*) AS n, avg(2) AS av,
             CAST(greatest(1, 5, 3) AS BIGINT) AS g""")
    },
    // mode() is a SELECTION function (builtins.c:4495
    // FUNC_MGT_SELECT_FUNC): scalar columns ride the mode row — the
    // LAST row (by ts) carrying the most-frequent value
    // (test_fun_select_mode.py checkRows(1); test_join_pk.py:322);
    // ties break to the larger value (sf_mode pin)
    "dialect_mode_ride" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_type, ts, mode(user_id) AS mv FROM events
           PARTITION BY event_type ORDER BY event_type""")
    },
    // numeric-as-boolean CASE WHEN (test_query_case_when.py:113
    // truthy-if-nonzero), greatest/least defaults (GTL-CFG-001
    // string-mix compares as strings; GTL-IGN-001 NULL propagates),
    // sleep(0) scalar (builtins.c:8239) — the r19/r20 micro-niches
    "dialect_truthy_greatest" -> { (s, dir) =>
      run(s, dir,
        """SELECT event_id,
             CAST(CASE WHEN value THEN 1 ELSE 0 END AS BIGINT) AS cw,
             CAST(CASE WHEN 1-1 THEN 5 END AS BIGINT) AS cz,
             greatest(2, '10') AS gs, least(2, '10') AS ls,
             CAST(greatest(user_id, NULL, 5) AS BIGINT) AS gn,
             CAST(sleep(0) AS BIGINT) AS sl
           FROM events WHERE user_id = 3 ORDER BY event_id""")
    },
    // first(*)/last(*) expand to one call per source column
    // (parTranslater star expansion)
    "dialect_first_star" -> { (s, dir) =>
      run(s, dir, "SELECT first(*) FROM events")
    },
    // tbname on a regular table = the table's own name, grouping key
    "dialect_tbname" -> { (s, dir) =>
      run(s, dir,
        """SELECT tbname, count(*) AS n FROM events GROUP BY tbname
           ORDER BY tbname""")
    },
    // bare tbname accompanying aggregates WITHOUT GROUP BY — legal in
    // the reference (tbname is per-table constant; probe receipts)
    "dialect_tbname_agg" -> { (s, dir) =>
      run(s, dir,
        """SELECT tbname, count(*) AS n, min(user_id) AS mu
           FROM events""")
    },
    // loose datetime literal widths ('2024-1-5 6:3:2', taosParseTime)
    "dialect_datetime_loose" -> { (s, dir) =>
      run(s, dir,
        """SELECT count(*) AS n, min(ts) AS mn FROM events
           WHERE ts >= '2024-1-5 6:3:2' AND ts < '2024-1-9 18:4:5.250'""")
    },
    // SELECT * over a derived table
    "dialect_star_subquery" -> { (s, dir) =>
      run(s, dir,
        """SELECT * FROM (SELECT user_id, avg(value) AS a FROM events
           GROUP BY user_id) WHERE a > 20 ORDER BY user_id""")
    },
    // _rowts pseudo-column = the row's primary timestamp
    "dialect_rowts" -> { (s, dir) =>
      run(s, dir,
        """SELECT _rowts AS rts, value FROM events WHERE user_id = 1
           ORDER BY rts LIMIT 50""")
    },
    // TOP under GROUP BY groups the selection (20-select.md)
    "dialect_top_groupby" -> { (s, dir) =>
      run(s, dir,
        """SELECT ts, user_id, event_id, TOP(value, 2) AS v FROM events
           GROUP BY user_id ORDER BY user_id, v DESC, ts, event_id""")
    },
    // apercentile's algo literal (builtins.c:3250): 'default' and
    // 't-digest' both serve the estimator contract
    "dialect_apercentile_algo" -> { (s, dir) =>
      run(s, dir,
        """SELECT user_id,
             (abs(apercentile(value, 50, 't-digest') -
                percentile(value, 50)) <=
               (max(value) - min(value)) * 0.05) AS ok50,
             count(*) AS n
           FROM events GROUP BY user_id ORDER BY user_id""")
    },
    // HISTOGRAM text forms (builtins.c:4032): all three bin-spec
    // modes — user_input edges, linear_bin width grid (±inf-padded),
    // log_bin geometric grid with normalized percentages
    "dialect_histogram" -> { (s, dir) =>
      run(s, dir,
        """SELECT HISTOGRAM(value, 'user_input', '[0,10,50,100,500]', 0)
           FROM events PARTITION BY user_id
           ORDER BY user_id, lower_bin""")
    },
    "dialect_histogram_linear" -> { (s, dir) =>
      run(s, dir,
        """SELECT HISTOGRAM(value, 'linear_bin',
             '{"start":0, "width":100, "count":4, "infinity":true}', 0)
           FROM events ORDER BY lower_bin""")
    },
    "dialect_histogram_log" -> { (s, dir) =>
      run(s, dir,
        """SELECT HISTOGRAM(value, 'log_bin',
             '{"start":1, "factor":4, "count":5, "infinity":false}', 1)
           FROM events ORDER BY lower_bin""")
    })

  def oracleSql: Map[String, String] = Map(
    "dialect_interval" ->
      """SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS _wstart,
           count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY _wstart""",
    "dialect_partition_fill" ->
      s"""WITH agg AS (
            SELECT user_id,
              epoch_us(ts) - epoch_us(ts) % 86400000000 AS ws,
              CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS v
            FROM events
            WHERE epoch_us(ts) >= $T0 AND epoch_us(ts) < $T5
            GROUP BY 1, 2),
          spine AS (
            SELECT u.user_id, gs.ws
            FROM (SELECT DISTINCT user_id FROM agg) u
            CROSS JOIN (SELECT unnest(range($T0, $T5, 86400000000)) AS ws) gs),
          joined AS (
            SELECT s.user_id, s.ws, a.v
            FROM spine s LEFT JOIN agg a
              ON s.user_id = a.user_id AND s.ws = a.ws)
          SELECT user_id, ws AS _wstart,
            last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
              ORDER BY ws ROWS UNBOUNDED PRECEDING) AS v
          FROM joined ORDER BY user_id, _wstart""",
    "dialect_interval_offset_fill" ->
      s"""WITH agg AS (
            SELECT user_id,
              epoch_us(ts) - (epoch_us(ts) - ${6 * H}) % $D AS ws,
              CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS v
            FROM events
            WHERE epoch_us(ts) >= $T0 AND epoch_us(ts) < $T5
            GROUP BY 1, 2),
          spine AS (
            SELECT u.user_id, gs.ws
            FROM (SELECT DISTINCT user_id FROM agg) u
            CROSS JOIN (SELECT unnest(range($G6, $T5, $D)) AS ws) gs),
          joined AS (
            SELECT s.user_id, s.ws, a.v
            FROM spine s LEFT JOIN agg a
              ON s.user_id = a.user_id AND s.ws = a.ws)
          SELECT user_id, ws AS _wstart,
            last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
              ORDER BY ws ROWS UNBOUNDED PRECEDING) AS v
          FROM joined ORDER BY user_id, _wstart""",
    "dialect_fill_value_f" ->
      s"""WITH agg AS (
            SELECT epoch_us(ts) - epoch_us(ts) % $D AS ws, count(*) AS n
            FROM events
            WHERE epoch_us(ts) >= ${T0 - 10 * D}
              AND epoch_us(ts) < ${T0 - 5 * D}
            GROUP BY 1),
          spine AS (SELECT unnest(range(${T0 - 10 * D}, ${T0 - 5 * D},
            $D)) AS ws)
          SELECT s.ws AS _wstart, coalesce(a.n, 0)::DOUBLE AS n
          FROM spine s LEFT JOIN agg a ON s.ws = a.ws
          ORDER BY _wstart""",
    "dialect_session_slimit" ->
      s"""WITH t AS (SELECT user_id, epoch_us(ts) AS t,
            CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${30 * 60000000L}
                 THEN 1 ELSE 0 END AS isnew
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT user_id, t,
            sum(isnew) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS sid
            FROM t),
          agg AS (SELECT user_id, sid, min(t) AS ws, max(t) AS we,
              count(*) AS n
            FROM s GROUP BY user_id, sid),
          slices AS (SELECT DISTINCT user_id FROM events
            ORDER BY user_id LIMIT 2 OFFSET 1)
          SELECT a.user_id, a.ws AS _wstart, a.we AS _wend, a.n
          FROM agg a JOIN slices sl ON a.user_id = sl.user_id
          ORDER BY a.user_id, _wstart""",
    "dialect_state_extend" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t,
            CASE WHEN value < 15 THEN NULL ELSE event_type END AS st
          FROM events),
        m AS (SELECT user_id, t, st,
            CASE WHEN st IS NOT NULL AND (last_value(st IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                IS DISTINCT FROM st)
              THEN 1 ELSE 0 END AS chg
          FROM t),
        w AS (SELECT user_id, t, st,
            sum(chg) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS wid
          FROM m)
        SELECT user_id, min(st) AS state, min(t) // 1000 AS _wstart_ms,
          max(t) // 1000 AS _wend_ms, count(*) AS n
        FROM w WHERE wid > 0 GROUP BY user_id, wid
        ORDER BY user_id, _wstart_ms""",
    "dialect_state_zeroth" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t, event_type,
            CASE WHEN lag(event_type) OVER w IS NULL
                 OR lag(event_type) OVER w <> event_type
                 THEN 1 ELSE 0 END AS chg
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT user_id, t, event_type,
            sum(chg) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS wid
            FROM t)
          SELECT user_id, min(event_type) AS state,
            min(t) // 1000 AS _wstart_ms, max(t) // 1000 AS _wend_ms,
            count(*) AS n
          FROM s GROUP BY user_id, wid
          HAVING min(event_type) IS DISTINCT FROM 'click'
          ORDER BY user_id, _wstart_ms""",
    "dialect_anomaly" ->
      """WITH s AS (SELECT user_id,
            CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sy,
            CAST(CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS syy,
            count(*) AS n
          FROM events GROUP BY user_id),
        f AS (SELECT e.user_id, epoch_us(e.ts) AS t,
            abs(CAST(e.value AS DOUBLE) - s.sy/s.n) >
              2.0 * sqrt((s.syy - s.sy*s.sy/s.n)/s.n) AS an,
            row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts) AS rn
          FROM events e JOIN s ON s.user_id = e.user_id),
        a AS (SELECT user_id, t, rn,
            row_number() OVER (PARTITION BY user_id ORDER BY t) AS rna
          FROM f WHERE an)
        SELECT user_id, min(t) // 1000 AS _wstart_ms,
          max(t) // 1000 AS _wend_ms, count(*) AS n
        FROM a GROUP BY user_id, rn - rna
        ORDER BY user_id, _wstart_ms""",
    "dialect_json_tag" ->
      """SELECT c_custkey,
           json_extract_string('{"name":"' || c_name || '","seg":"' ||
             c_mktsegment || '"}', '$.name') AS j_name,
           json_extract_string('{"name":"' || c_name || '","seg":"' ||
             c_mktsegment || '"}', '$.seg') AS j_seg
         FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""",
    "ns_interval_gate" ->
      """WITH t AS (SELECT epoch_us(ts) * 1000 + event_id % 1000 AS tn
          FROM events)
        SELECT tn // 3600000000000 * 3600000000000 AS _wstart_ns,
          count(*) AS n, min(tn) AS first_ns, max(tn) AS last_ns
        FROM t GROUP BY 1 ORDER BY _wstart_ns""",
    "dialect_in_subquery" ->
      """SELECT event_id, user_id, value FROM events
         WHERE user_id IN (SELECT user_id FROM events
                           WHERE event_type = 'purchase' AND value > 95)
           AND event_type = 'click'
         ORDER BY event_id""",
    "dialect_notin_subquery" ->
      """SELECT user_id, count(*) AS n FROM events
         WHERE user_id NOT IN (SELECT user_id FROM events
                               WHERE event_type = 'purchase'
                                 AND value > 99.5)
         GROUP BY user_id ORDER BY user_id""",
    "dialect_match" ->
      """SELECT event_id, event_type, user_id FROM events
         WHERE regexp_matches(event_type, '^(cl|pu)')
           AND NOT regexp_matches(event_type, 'ick$')
           AND user_id < 40
         ORDER BY event_id""",
    "dialect_scalar_subquery" ->
      """SELECT event_id, user_id, value FROM events
         WHERE value >= (SELECT max(value) FROM events
                         WHERE event_type = 'view') - 0.5
         ORDER BY event_id""",
    "dialect_subquery" ->
      s"""WITH f AS (SELECT user_id, epoch_us(ts) AS t FROM events
            WHERE event_type = 'click'),
          t AS (SELECT user_id, t,
            CASE WHEN lag(t) OVER w IS NULL
                 OR t - lag(t) OVER w > ${30 * 60000000L}
                 THEN 1 ELSE 0 END AS isnew
            FROM f WINDOW w AS (PARTITION BY user_id ORDER BY t)),
          s AS (SELECT user_id, t,
            sum(isnew) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS sid
            FROM t)
          SELECT user_id, min(t) AS _wstart, max(t) AS _wend,
            count(*) AS n
          FROM s GROUP BY user_id, sid
          ORDER BY user_id, _wstart""",
    "dialect_subquery_agg" ->
      s"""WITH i AS (SELECT user_id,
            epoch_us(ts) // ${3600000000L} AS wh, count(*) AS n
            FROM events GROUP BY user_id, wh)
          SELECT user_id, max(n) AS max_n
          FROM i GROUP BY user_id ORDER BY user_id""",
    "dialect_session_limit" ->
      s"""WITH t AS (SELECT user_id, epoch_us(ts) AS t,
            CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${30 * 60000000L}
                 THEN 1 ELSE 0 END AS isnew
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT user_id, t,
            sum(isnew) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS sid
            FROM t),
          agg AS (SELECT user_id, sid, min(t) AS ws, max(t) AS we,
              count(*) AS n
            FROM s GROUP BY user_id, sid),
          ranked AS (SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY ws) AS rn
            FROM agg)
          SELECT user_id, ws AS _wstart, we AS _wend, n
          FROM ranked WHERE rn <= 2 ORDER BY user_id, _wstart""",
    // the dialect windows are semantically identical to their
    // DataFrame-API twins — share the proven oracle text
    "dialect_interval_sliding" -> TimeSeries.oracleSql("interval_sliding"),
    "dialect_external_window" ->
      """WITH w AS (SELECT DISTINCT
             epoch_us(ts) - epoch_us(ts) % 43200000000 AS ws
           FROM events WHERE user_id = 7)
         SELECT ws // 1000 AS ws_ms,
           (ws + 43200000000) // 1000 AS we_ms, count(*) AS n
         FROM events e JOIN w
           ON epoch_us(e.ts) >= ws
          AND epoch_us(e.ts) < ws + 43200000000
         GROUP BY 1, 2 ORDER BY ws_ms""",
    "dialect_external_fill" ->
      """WITH w AS (SELECT DISTINCT
             epoch_us(ts) - epoch_us(ts) % 43200000000 AS ws
           FROM events WHERE user_id = 7),
         agg AS (SELECT ws, count(*) AS n,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS DOUBLE) AS sv
           FROM events e JOIN w
             ON epoch_us(e.ts) >= ws
            AND epoch_us(e.ts) < ws + 43200000000
           WHERE user_id = 3 GROUP BY ws),
         ext AS (SELECT min(ws) AS lo, max(ws) AS hi FROM agg)
         SELECT w.ws // 1000 AS ws_ms,
           coalesce(agg.n, 0) AS n,
           coalesce(agg.sv, -1.0) AS sv
         FROM w LEFT JOIN agg ON w.ws = agg.ws, ext
         WHERE agg.ws IS NOT NULL OR (w.ws > ext.lo AND w.ws < ext.hi)
         ORDER BY ws_ms""",
    "dialect_interval_month" ->
      """SELECT user_id,
           epoch_us(date_trunc('month', ts)) // 1000 AS ws_ms,
           epoch_us(date_trunc('month', ts) + INTERVAL 1 MONTH) // 1000
             AS we_ms,
           count(*) AS n
         FROM events GROUP BY 1, 2, 3 ORDER BY user_id, ws_ms""",
    "dialect_interp_surround" ->
      TimeSeries.oracleSql("interp_near_surround"),
    "dialect_state_window" -> TimeSeries.oracleSql("state_window"),
    "dialect_state_multi" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t, event_type,
            CAST(value > 50 AS INT) AS hi,
            CASE WHEN lag(event_type) OVER w IS NULL
                 OR lag(event_type) OVER w <> event_type
                 OR lag(CAST(value > 50 AS INT)) OVER w
                    <> CAST(value > 50 AS INT)
                 THEN 1 ELSE 0 END AS chg
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT user_id, t, event_type, hi,
            sum(chg) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS wid
            FROM t)
          SELECT user_id, min(t) // 1000 AS _wstart_ms,
            max(t) // 1000 AS _wend_ms, count(*) AS n,
            min(event_type) AS event_type, min(hi) AS hi
          FROM s GROUP BY user_id, wid
          ORDER BY user_id, _wstart_ms""",
    "dialect_fill_forward" ->
      """SELECT user_id, epoch_us(ts) // 1000 AS ts_ms,
           last_value(CASE WHEN value < 15 THEN NULL
                      ELSE value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS ff
         FROM events ORDER BY user_id, ts_ms""",
    "dialect_count_window" -> TimeSeries.oracleSql("count_window"),
    "dialect_correlated_subquery" ->
      """SELECT c_custkey,
           (SELECT count(*) FROM orders
            WHERE orders.o_custkey = customer.c_custkey) AS n_orders,
           (SELECT min(o_orderkey) FROM orders
            WHERE orders.o_custkey < customer.c_custkey) AS min_ok
         FROM customer WHERE c_custkey <= 50
         ORDER BY c_custkey""",
    "dialect_event_truefor_limits" ->
      PinnedOracles.sfEventTrueForLimits,
    "dialect_event_truefor_keyless" ->
      PinnedOracles.sfEventTrueForLimitsKeyless,
    // TRUE_FOR compares window duration in the native µs domain
    "dialect_state_truefor" ->
      stateTrueForOracle(s"max(t) - min(t) >= ${2 * H}"),
    // COUNT / AND / OR limit forms (sql.y true_for_opt :3030-3032;
    // executor.c isTrueForSatisfied)
    "dialect_state_truefor_count" ->
      stateTrueForOracle("count(*) >= 5"),
    "dialect_state_truefor_and" ->
      stateTrueForOracle(s"max(t) - min(t) >= ${2 * H} AND count(*) >= 5"),
    "dialect_state_truefor_or" ->
      stateTrueForOracle(s"max(t) - min(t) >= ${2 * H} OR count(*) >= 5"),
    "dialect_event_truefor" ->
      s"""WITH RECURSIVE numbered AS (
            SELECT user_id, epoch_us(ts) AS t,
              value > 90 AS s, value < 10 AS e,
              row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
            FROM events),
          walk AS (
            SELECT user_id, t, rn,
              CASE WHEN s THEN t END AS wstart,
              (s AND NOT e) AS open_after
            FROM numbered WHERE rn = 1
            UNION ALL
            SELECT n.user_id, n.t, n.rn,
              CASE WHEN w.open_after THEN w.wstart
                   WHEN n.s THEN n.t END AS wstart,
              CASE WHEN w.open_after THEN NOT n.e
                   WHEN n.s THEN NOT n.e ELSE false END AS open_after
            FROM numbered n JOIN walk w
              ON n.user_id = w.user_id AND n.rn = w.rn + 1)
          SELECT user_id, wstart // 1000 AS _wstart_ms,
            max(t) // 1000 AS _wend_ms, count(*) AS n
          FROM walk WHERE wstart IS NOT NULL
          GROUP BY user_id, wstart
          HAVING max(t) - wstart >= $H
          ORDER BY user_id, _wstart_ms""",
    "dialect_event_window" -> TimeSeries.oracleSql("event_window"),
    "dialect_interp" -> TimeSeries.oracleSql("interp_linear"),
    "dialect_asof_join" ->
      """WITH l AS (SELECT user_id, ts, event_id FROM events
             WHERE event_type = 'purchase'),
           r AS (SELECT user_id, ts, event_id, value FROM events
             WHERE event_type = 'click'),
           j AS (SELECT a.user_id, a.ts, a.event_id,
               b.event_id AS bid, b.value AS bval,
               row_number() OVER (PARTITION BY a.user_id, a.ts, a.event_id
                 ORDER BY b.ts DESC, b.event_id DESC) AS rk
             FROM l a LEFT JOIN r b
               ON b.user_id = a.user_id AND b.ts <= a.ts)
         SELECT user_id, epoch_us(ts) // 1000 AS ts_ms, event_id,
           bid AS click_event_id, bval AS click_value
         FROM j WHERE rk = 1
         ORDER BY user_id, ts_ms, event_id""",
    "dialect_window_join" ->
      s"""SELECT a.user_id, epoch_us(a.ts) // 1000 AS ts_ms, a.event_id,
            b.event_id AS click_event_id, b.value AS click_value
          FROM (SELECT user_id, ts, event_id FROM events
                WHERE event_type = 'purchase') a
          LEFT JOIN (SELECT user_id, ts, event_id, value FROM events
                WHERE event_type = 'click') b
            ON a.user_id = b.user_id
            AND epoch_us(b.ts) >= epoch_us(a.ts) - ${30 * 60000000L}
            AND epoch_us(b.ts) <= epoch_us(a.ts) + ${30 * 60000000L}
          ORDER BY a.user_id, ts_ms, a.event_id, click_event_id""",
    "dialect_window_join_agg" ->
      s"""SELECT a.user_id, epoch_us(a.ts) // 1000 AS ts_ms, a.event_id,
            count(b.user_id) AS n, count(b.value) AS nv,
            CAST(CAST(sum(CAST(b.value AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS DOUBLE) AS sv
          FROM (SELECT user_id, ts, event_id FROM events
                WHERE event_type = 'purchase') a
          LEFT JOIN (SELECT user_id, ts, value FROM events
                WHERE event_type = 'click') b
            ON a.user_id = b.user_id
            AND epoch_us(b.ts) >= epoch_us(a.ts) - ${30 * 60000000L}
            AND epoch_us(b.ts) <= epoch_us(a.ts) + ${30 * 60000000L}
          GROUP BY a.user_id, a.ts, a.event_id
          ORDER BY a.user_id, ts_ms, a.event_id""",
    "dialect_inner_join" ->
      """SELECT o_custkey AS custkey, o_orderkey, o_totalprice,
           c_name, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "dialect_forecast" -> {
      val T0us = 1704067200000000L
      val day = 24L * 3600000000L
      s"""WITH RECURSIVE s AS (
            SELECT user_id,
              row_number() OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS rn,
              CAST(value AS DOUBLE) AS y
            FROM events),
          mx AS (SELECT user_id, max(rn) AS mr FROM s GROUP BY user_id),
          r AS (
            SELECT user_id, rn, y AS l, CAST(0 AS DOUBLE) AS b
            FROM s WHERE rn = 1
            UNION ALL
            SELECT s.user_id, s.rn,
              0.5 * s.y + (1 - 0.5) * (r.l + r.b),
              0.3 * ((0.5 * s.y + (1 - 0.5) * (r.l + r.b)) - r.l)
                + (1 - 0.3) * r.b
            FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1),
          fin AS (SELECT r.user_id, r.l, r.b FROM r
            JOIN mx ON mx.user_id = r.user_id AND r.rn = mx.mr),
          hs AS (SELECT * FROM (VALUES (1), (2), (3)) AS t(h))
          SELECT user_id, $T0us + (h - 1) * $day AS _frowts,
            round(l + h * b, 6) AS forecast
          FROM fin CROSS JOIN hs
          ORDER BY user_id, _frowts"""
    },
    "dialect_semi_join" ->
      """SELECT event_id FROM events a
         SEMI JOIN events b
           ON a.user_id = b.user_id AND b.value > 95
         WHERE a.value > 50 ORDER BY event_id""",
    "dialect_anti_join" ->
      """SELECT event_id FROM events a
         ANTI JOIN (SELECT user_id FROM events
                    WHERE event_type = 'purchase' AND value > 99.9) b
           ON a.user_id = b.user_id
         ORDER BY event_id""",
    "dialect_right_join" ->
      """SELECT c_custkey AS custkey, o_orderkey, o_totalprice, c_name
         FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
         ORDER BY custkey, o_orderkey NULLS FIRST""",
    "dialect_full_join" ->
      """WITH p AS (SELECT user_id, event_id FROM events
            WHERE event_type = 'purchase'),
          c AS (SELECT user_id, event_id, value FROM events
            WHERE event_type = 'click')
         SELECT COALESCE(p.event_id, c.event_id) AS event_id,
           p.user_id AS user_id, c.user_id AS r_user_id,
           c.value AS r_value
         FROM p FULL JOIN c ON p.event_id = c.event_id
         ORDER BY event_id""",
    "dialect_diff" ->
      """SELECT user_id, epoch_us(ts) // 1000 AS ts_ms,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts)
             AS diff_v
         FROM events
         QUALIFY row_number()
           OVER (PARTITION BY user_id ORDER BY ts) > 1
         ORDER BY user_id, ts_ms""",
    // same accumulation as the DataFrame-API sf_csum oracle
    "dialect_csum" -> Functions.oracleSql("sf_csum"),
    "dialect_mavg" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t,
           CASE WHEN count(value) OVER w7 = 7 THEN
             round(CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w7 AS DECIMAL(18,2)) AS DOUBLE) / 7, 6) END AS mavg
           FROM events
           WINDOW w7 AS (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         SELECT user_id, t // 1000 AS ts_ms, mavg FROM t
         ORDER BY user_id, ts_ms""",
    "dialect_distinct" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    "dialect_union" ->
      """SELECT user_id, count(*) AS n, 'purchase' AS kind
         FROM events WHERE event_type = 'purchase' GROUP BY user_id
         UNION ALL
         SELECT user_id, count(*) AS n, 'click' AS kind
         FROM events WHERE event_type = 'click' GROUP BY user_id
         ORDER BY user_id, kind""",
    // cols(max(event_id), …) picks companion values at the arg-max row;
    // event_id is unique so max_by/min_by are deterministic in both engines
    "dialect_cols" ->
      """SELECT user_id,
           max_by(epoch_us(ts) // 1000, event_id) AS ts_at_max,
           max_by(value, event_id) AS v_at_max,
           min_by(epoch_us(ts) // 1000, event_id) AS ts_at_min
         FROM events GROUP BY user_id ORDER BY user_id""",
    "dialect_over" ->
      """SELECT user_id, epoch_us(ts) // 1000 AS ts_ms, event_id,
           rank() OVER (PARTITION BY user_id
             ORDER BY value DESC, event_id) AS rk,
           dense_rank() OVER (PARTITION BY user_id
             ORDER BY value DESC, event_id) AS drk,
           row_number() OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS rn,
           lag(value, 1) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS lg,
           lead(value, 1) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS ld,
           nth_value(value, 3) OVER (PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nth,
           round(percent_rank() OVER (PARTITION BY user_id
             ORDER BY value, event_id), 6) AS pr,
           round(cume_dist() OVER (PARTITION BY user_id
             ORDER BY value, event_id), 6) AS cd
         FROM events ORDER BY user_id, ts_ms, event_id""",
    "dialect_approx" ->
      """SELECT * FROM (
          SELECT * FROM (VALUES
            ('click', CAST(151 AS BIGINT), true, CAST(2006 AS BIGINT)),
            ('error', CAST(151 AS BIGINT), true, CAST(2014 AS BIGINT)),
            ('purchase', CAST(151 AS BIGINT), true, CAST(1981 AS BIGINT)),
            ('signup', CAST(151 AS BIGINT), true, CAST(2017 AS BIGINT)),
            ('view', CAST(151 AS BIGINT), true, CAST(1982 AS BIGINT)))
          t(event_type, approx_users, ok50, n)
          WHERE (SELECT count(*) FROM events) = 10000
          UNION ALL
          SELECT * FROM (VALUES
            ('click', CAST(1400 AS BIGINT), true, CAST(19863 AS BIGINT)),
            ('error', CAST(1400 AS BIGINT), true, CAST(19810 AS BIGINT)),
            ('purchase', CAST(1400 AS BIGINT), true,
              CAST(20084 AS BIGINT)),
            ('signup', CAST(1400 AS BIGINT), true, CAST(20302 AS BIGINT)),
            ('view', CAST(1400 AS BIGINT), true, CAST(19941 AS BIGINT)))
          t(event_type, approx_users, ok50, n)
          WHERE (SELECT count(*) FROM events) = 100000) u
          ORDER BY event_type""",
    "dialect_agg_misc" ->
      """SELECT user_id,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(stddev_pop(value), 6) AS sd_pop,
           round(stddev_samp(value), 6) AS sd_samp,
           max(epoch_us(ts)) - min(epoch_us(ts)) AS span_us,
           round((max(epoch_us(ts)) - min(epoch_us(ts)))
             / 3600000000.0, 6) AS span_h
         FROM events GROUP BY user_id ORDER BY user_id""",
    "dialect_qrange" ->
      s"""SELECT CAST($T0 AS BIGINT) AS qs,
            CAST(${T5 - 1} AS BIGINT) AS qe,
            CAST(${T5 - T0} AS BIGINT) AS qd, count(*) AS n
          FROM events WHERE epoch_us(ts) >= $T0 AND epoch_us(ts) < $T5""",
    "dialect_nulls_order" ->
      """SELECT event_id,
           CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS v
         FROM events WHERE user_id < 5
         ORDER BY v ASC NULLS FIRST, event_id""",
    // DuckDB resolves its own WINDOW clause — a true named-window
    // round-trip on both engines
    "dialect_named_window" ->
      """SELECT user_id, epoch_us(ts) // 1000 AS ts_ms, event_id,
           rank() OVER w AS rk,
           max(value) OVER wrows AS mx4,
           count(*) OVER wrange AS cnt_1h,
           min(value) OVER wrange AS mn_1h
         FROM events WHERE user_id < 20
         WINDOW w AS (PARTITION BY user_id
             ORDER BY value DESC, event_id),
           wrows AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
           wrange AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, ts_ms, event_id""",
    // same accumulation spelling as the direct imputation_linear oracle
    "dialect_imputation" -> Analytics.oracleSql("imputation_linear"),
    "dialect_anomalycheck" ->
      """WITH s AS (SELECT user_id,
            CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sy,
            CAST(CAST(sum(CAST(value AS DECIMAL(18,2)) *
              CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS syy,
            count(*) AS n
          FROM events GROUP BY user_id)
         SELECT e.user_id, epoch_us(e.ts) // 1000 AS ts_ms, e.event_id,
           e.value AS value,
           coalesce(abs(e.value - s.sy/s.n) >
             2.0 * sqrt((s.syy - s.sy*s.sy/s.n)/s.n), false)
             AS _anomalymark
         FROM events e JOIN s ON s.user_id = e.user_id
         ORDER BY e.user_id, ts_ms, e.event_id""",
    // %U = Sunday-first week, 00-53, week 0 before the first Sunday —
    // exactly MySQL WEEK(d,0); weekofyear = ISO = MySQL WEEK(d,3);
    // DuckDB // floors, so negative timediff needs the trunc guard
    "dialect_scalar_time" ->
      s"""SELECT event_id,
           (epoch_us(ts) - $T0) // ${H} AS td_h,
           CASE WHEN epoch_us(ts) <= $T0
             THEN ($T0 - epoch_us(ts)) // ${D}
             ELSE -((epoch_us(ts) - $T0) // ${D}) END AS td_negd,
           $T0 - epoch_us(ts) + 2 * (epoch_us(ts) - $T0) AS td_raw,
           strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || '+0000' AS iso,
           epoch_us(date_trunc('second', ts)) AS rt_us,
           CAST(strftime(ts, '%U') AS BIGINT) AS wk0,
           CAST(weekofyear(ts) AS BIGINT) AS wk3,
           CAST(weekofyear(ts) AS BIGINT) AS woy,
           CAST(isodow(ts) - 1 AS BIGINT) AS wd,
           CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
           'UTC (UTC, +0000)' AS tz
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "dialect_timetruncate_tz" ->
      """SELECT event_id,
           epoch_us(date_trunc('month', ts)) AS mon_utc,
           CASE WHEN epoch_us(ts) >= 1704085200000000
             THEN 1704085200000000 ELSE 1696132800000000 END AS q_ny,
           (epoch_us(ts) + 28800000000)
             - (epoch_us(ts) + 28800000000) % 86400000000
             - 28800000000 AS d_sh
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "dialect_iso8601_tz" ->
      """SELECT event_id,
           strftime(ts + INTERVAL 8 HOUR, '%Y-%m-%dT%H:%M:%S.%f')
             || '+0800' AS iso_sh,
           strftime(ts - INTERVAL 5 HOUR, '%Y-%m-%dT%H:%M:%S.%f')
             || '-0500' AS iso_ny,
           strftime(ts - INTERVAL 330 MINUTE, '%Y-%m-%dT%H:%M:%S.%f')
             || '-05:30' AS iso_off,
           strftime(ts + INTERVAL 8 HOUR, '%Y-%m-%dT%H:%M:%S.%f')
             || '+08' AS iso_utc8,
           strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || 'z' AS iso_z
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "dialect_scalar_misc" ->
      """SELECT c_custkey,
           trunc(CAST(c_acctbal * 1.7 AS DOUBLE) * 100) / 100 AS tr2,
           trunc(CAST(c_acctbal AS DOUBLE)) / 1.0 AS tr0,
           chr(CAST(65 + c_custkey % 26 AS INT)) ||
             chr(CAST(97 + c_custkey % 26 AS INT)) AS ch2,
           to_base64(encode(c_name)) AS b64,
           decode(from_base64(to_base64(encode(c_name)))) AS rt,
           greatest(c_custkey % 7, c_custkey % 5, 3) AS gt,
           least(c_custkey % 7, c_custkey % 5) AS lt,
           length(c_name) AS clen,
           ascii(c_name) AS asc_c,
           position('3' IN c_name) AS pos_c,
           mod(c_custkey, 7) AS md,
           CAST(sign(c_acctbal - 10) AS DOUBLE) AS sg,
           CAST(sign(c_custkey - 250) AS BIGINT) AS sgi,
           md5(c_name) AS h
         FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""",
    "dialect_fill_multi" ->
      s"""WITH agg AS (SELECT epoch_us(ts) - epoch_us(ts) % $D AS ws,
            max(value) AS mx, min(value) AS mn
          FROM events
          WHERE epoch_us(ts) >= $T0 AND epoch_us(ts) < ${T0 + 31 * D}
            AND user_id = 3 AND event_type = 'purchase' AND value > 90
          GROUP BY 1),
        spine AS (SELECT unnest(range($T0, ${T0 + 31 * D}, $D)) AS ws)
        SELECT s.ws AS _wstart, coalesce(a.mx, 1.5) AS mx,
          coalesce(a.mn, 2.5) AS mn
        FROM spine s LEFT JOIN agg a ON s.ws = a.ws
        ORDER BY _wstart""",
    "dialect_fill_calendar" ->
      """WITH agg AS (SELECT epoch_us(date_trunc('month', ts)) AS ws,
            count(*) AS n, max(value) AS mx
          FROM events
          WHERE ts >= TIMESTAMP '2023-11-01' AND ts < TIMESTAMP '2024-04-01'
          GROUP BY 1),
        spine AS (SELECT epoch_us(CAST(x AS TIMESTAMP)) AS ws
          FROM generate_series(TIMESTAMP '2023-11-01',
            TIMESTAMP '2024-03-01', INTERVAL 1 MONTH) t(x))
        SELECT s.ws AS _wstart, CAST(coalesce(a.n, 0) AS DOUBLE) AS n,
          coalesce(a.mx, -1) AS mx
        FROM spine s LEFT JOIN agg a ON s.ws = a.ws ORDER BY _wstart""",
    "dialect_fill_value_expr" ->
      s"""WITH agg AS (SELECT epoch_us(ts) - epoch_us(ts) % $D AS ws,
            max(value) AS mx, min(value) AS mn, count(value) AS cnt
          FROM events
          WHERE epoch_us(ts) >= $T0 AND epoch_us(ts) < ${T0 + 31 * D}
            AND user_id = 3 AND event_type = 'purchase' AND value > 90
          GROUP BY 1),
        spine AS (SELECT unnest(range($T0, ${T0 + 31 * D}, $D)) AS ws)
        SELECT s.ws AS _wstart, coalesce(a.mx, 3) AS mx,
          coalesce(a.mn, 10) AS mn,
          CAST(coalesce(a.cnt, 1.0) AS DOUBLE) AS cnt
        FROM spine s LEFT JOIN agg a ON s.ws = a.ws
        ORDER BY _wstart""",
    "dialect_fill_norange" ->
      s"""WITH agg AS (SELECT epoch_us(ts) - epoch_us(ts) % $D AS ws,
            max(value) AS mx
          FROM events
          WHERE user_id = 3 AND event_type = 'purchase' AND value > 90
          GROUP BY 1),
        ext AS (SELECT min(ws) AS lo, max(ws) AS hi FROM agg),
        spine AS (SELECT unnest(range((SELECT lo FROM ext),
          (SELECT hi FROM ext) + $D, $D)) AS ws),
        j AS (SELECT s.ws, a.mx, a.ws IS NULL AS f
          FROM spine s LEFT JOIN agg a ON s.ws = a.ws)
        SELECT ws AS _wstart,
          last_value(mx IGNORE NULLS) OVER (ORDER BY ws
            ROWS UNBOUNDED PRECEDING) AS mx
        FROM j ORDER BY _wstart""",
    "dialect_interp_multi" ->
      s"""WITH data AS (SELECT user_id, epoch_us(ts) AS t,
            CAST(value AS DOUBLE) AS v1, CAST(event_id AS DOUBLE) AS v2,
            false AS g FROM events),
          grid AS (SELECT u.user_id, gs.t, NULL::DOUBLE AS v1,
            NULL::DOUBLE AS v2, true AS g
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (SELECT unnest(range($T0, ${TEND + 1},
              ${12 * H})) AS t) gs),
          unioned AS (SELECT * FROM data UNION ALL SELECT * FROM grid),
          marked AS (SELECT user_id, t, g,
            last_value(CASE WHEN NOT g AND v1 IS NOT NULL
              THEN struct_pack(t := t, v := v1) END IGNORE NULLS)
              OVER wprev AS p1,
            first_value(CASE WHEN NOT g AND v1 IS NOT NULL
              THEN struct_pack(t := t, v := v1) END IGNORE NULLS)
              OVER wnext AS n1,
            last_value(CASE WHEN NOT g AND v2 IS NOT NULL
              THEN struct_pack(t := t, v := v2) END IGNORE NULLS)
              OVER wprev AS p2,
            first_value(CASE WHEN NOT g AND v2 IS NOT NULL
              THEN struct_pack(t := t, v := v2) END IGNORE NULLS)
              OVER wnext AS n2
            FROM unioned
            WINDOW wprev AS (PARTITION BY user_id ORDER BY t, g
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            wnext AS (PARTITION BY user_id ORDER BY t, g
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
          SELECT user_id, t // 1000 AS _irowts_ms,
            round(CASE WHEN p1 IS NOT NULL AND p1.t = t THEN p1.v
              ELSE p1.v + (n1.v - p1.v) * CAST(t - p1.t AS DOUBLE)
                / CAST(n1.t - p1.t AS DOUBLE) END, 6) AS v1,
            round(CASE WHEN p2 IS NOT NULL AND p2.t = t THEN p2.v
              ELSE p2.v + (n2.v - p2.v) * CAST(t - p2.t AS DOUBLE)
                / CAST(n2.t - p2.t AS DOUBLE) END, 6) AS v2
          FROM marked
          WHERE g AND ((p1 IS NOT NULL AND p1.t = t)
            OR (p1 IS NOT NULL AND n1 IS NOT NULL))
          ORDER BY user_id, _irowts_ms""",
    "dialect_interp_near_values" ->
      s"""WITH d AS (SELECT user_id, epoch_us(ts) AS t,
            CAST(value AS DOUBLE) AS v1d, CAST(event_id AS DOUBLE) AS v2d
          FROM events),
        n AS (SELECT user_id,
            min_by(struct_pack(t := t, v1 := v1d, v2 := v2d),
              abs(t - ${T0 + 37 * H + H / 2}) * 2
                + CASE WHEN t <= ${T0 + 37 * H + H / 2}
                  THEN 0 ELSE 1 END) AS nr
          FROM d GROUP BY user_id)
        SELECT user_id,
          ${(T0 + 37 * H + H / 2) / 1000} AS _irowts_ms,
          round(CASE WHEN abs(nr.t - ${T0 + 37 * H + H / 2}) <= $H
            THEN nr.v1 ELSE -1 END, 6) AS v1,
          round(CASE WHEN abs(nr.t - ${T0 + 37 * H + H / 2}) <= $H
            THEN nr.v2 ELSE -2 END, 6) AS v2,
          nr.t <> ${T0 + 37 * H + H / 2} AS _isfilled
        FROM n ORDER BY user_id""",
    // pinned week numbers regenerate with tools/gen_week_oracle.py;
    // the join-to-actual-days shape drops (and so FAILS loudly on) any
    // day the pin does not cover
    "dialect_week_modes" ->
      """WITH days AS (SELECT DISTINCT
            epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us
          FROM events),
        pin AS (SELECT * FROM (VALUES
            (1704067200000000, 0, 1, 53, 1, 1, 1, 1, 1),
            (1704153600000000, 0, 1, 53, 1, 1, 1, 1, 1),
            (1704240000000000, 0, 1, 53, 1, 1, 1, 1, 1),
            (1704326400000000, 0, 1, 53, 1, 1, 1, 1, 1),
            (1704412800000000, 0, 1, 53, 1, 1, 1, 1, 1),
            (1704499200000000, 0, 1, 53, 1, 1, 1, 1, 1),
            (1704585600000000, 1, 1, 1, 1, 2, 1, 2, 1),
            (1704672000000000, 1, 2, 1, 2, 2, 2, 2, 2),
            (1704758400000000, 1, 2, 1, 2, 2, 2, 2, 2),
            (1704844800000000, 1, 2, 1, 2, 2, 2, 2, 2),
            (1704931200000000, 1, 2, 1, 2, 2, 2, 2, 2),
            (1705017600000000, 1, 2, 1, 2, 2, 2, 2, 2),
            (1705104000000000, 1, 2, 1, 2, 2, 2, 2, 2),
            (1705190400000000, 2, 2, 2, 2, 3, 2, 3, 2),
            (1705276800000000, 2, 3, 2, 3, 3, 3, 3, 3),
            (1705363200000000, 2, 3, 2, 3, 3, 3, 3, 3),
            (1705449600000000, 2, 3, 2, 3, 3, 3, 3, 3),
            (1705536000000000, 2, 3, 2, 3, 3, 3, 3, 3),
            (1705622400000000, 2, 3, 2, 3, 3, 3, 3, 3),
            (1705708800000000, 2, 3, 2, 3, 3, 3, 3, 3),
            (1705795200000000, 3, 3, 3, 3, 4, 3, 4, 3),
            (1705881600000000, 3, 4, 3, 4, 4, 4, 4, 4),
            (1705968000000000, 3, 4, 3, 4, 4, 4, 4, 4),
            (1706054400000000, 3, 4, 3, 4, 4, 4, 4, 4),
            (1706140800000000, 3, 4, 3, 4, 4, 4, 4, 4),
            (1706227200000000, 3, 4, 3, 4, 4, 4, 4, 4),
            (1706313600000000, 3, 4, 3, 4, 4, 4, 4, 4),
            (1706400000000000, 4, 4, 4, 4, 5, 4, 5, 4),
            (1706486400000000, 4, 5, 4, 5, 5, 5, 5, 5),
            (1706572800000000, 4, 5, 4, 5, 5, 5, 5, 5),
            (1706659200000000, 4, 5, 4, 5, 5, 5, 5, 5)
          ) t(day_us, w0, w1, w2, w3, w4, w5, w6, w7))
        SELECT d.day_us, CAST(p.w0 AS BIGINT) AS w0,
          CAST(p.w1 AS BIGINT) AS w1, CAST(p.w2 AS BIGINT) AS w2,
          CAST(p.w3 AS BIGINT) AS w3, CAST(p.w4 AS BIGINT) AS w4,
          CAST(p.w5 AS BIGINT) AS w5, CAST(p.w6 AS BIGINT) AS w6,
          CAST(p.w7 AS BIGINT) AS w7
        FROM days d JOIN pin p ON d.day_us = p.day_us
        ORDER BY d.day_us""",
    "dialect_partition_const" ->
      """SELECT event_id FROM events WHERE event_id < 100
         ORDER BY event_id""",
    "dialect_order_agg" ->
      """SELECT user_id, count(*) AS n FROM events GROUP BY user_id
         ORDER BY count(*) DESC, user_id LIMIT 5""",
    "dialect_scalar_hash" -> graft.PinnedOracles.scalarHash,
    "dialect_string_fns" ->
      """SELECT c_custkey,
           split_part(c_name, '#', 1) AS si_head,
           string_split(c_name, '#')[-1] AS si_tail,
           CASE c_mktsegment WHEN 'BUILDING' THEN 1
             WHEN 'AUTOMOBILE' THEN 2 WHEN 'MACHINERY' THEN 3
             WHEN 'HOUSEHOLD' THEN 4 WHEN 'FURNITURE' THEN 5
             ELSE 0 END AS fis,
           repeat(substr(c_name, 1, 2), 3) AS rep,
           replace(c_name, 'Customer', 'Cust') AS repl,
           ltrim('  ' || c_name) AS lt,
           rtrim(c_name || '  ') AS rt
         FROM customer WHERE c_custkey <= 40 ORDER BY c_custkey""",
    "dialect_sysinfo" ->
      """SELECT r_regionkey, '3.3.6.0' AS sv, '3.3.6.0' AS cv,
           'root' AS cu, 'root' AS usr, 'default' AS db,
           CAST(0 AS BIGINT) AS fdow
         FROM region ORDER BY r_regionkey""",
    "dialect_top" ->
      """WITH r AS (SELECT epoch_us(ts) AS ts, user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id
             ORDER BY value DESC, ts ASC, event_id ASC) AS rn FROM events)
         SELECT ts, user_id, event_id, value AS v FROM r WHERE rn <= 3
         ORDER BY user_id, v DESC, ts, event_id""",
    "dialect_tail" ->
      """WITH r AS (SELECT epoch_us(ts) AS ts, user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         SELECT ts, user_id, event_id, value AS v FROM r
         WHERE rn > 2 AND rn <= 7 ORDER BY user_id, ts, event_id""",
    "dialect_unique" ->
      """WITH r AS (SELECT user_id, event_type AS et, epoch_us(ts) AS ts,
           row_number() OVER (PARTITION BY user_id, event_type
             ORDER BY ts, event_id) AS rn FROM events)
         SELECT user_id, et, ts FROM r WHERE rn = 1
         ORDER BY user_id, et""",
    "dialect_std" ->
      """SELECT user_id, round(stddev_pop(value), 6) AS sd FROM events
         GROUP BY user_id ORDER BY user_id""",
    "dialect_comma_join" ->
      """SELECT o.o_custkey AS custkey, o.o_orderkey, c.c_name
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE o.o_totalprice > 260000
         ORDER BY custkey, o_orderkey""",
    "dialect_interval_cal_sliding" ->
      """WITH e AS (SELECT epoch_us(ts) AS t, value FROM events),
         c AS (SELECT t, value,
             (t // 1296000000000 - 3 + x) * 1296000000000 AS ws
           FROM (SELECT t, value, unnest(range(0, 4)) AS x FROM e)),
         k AS (SELECT t, value, ws,
             epoch_us(to_timestamp(ws // 1000000) + INTERVAL 1 MONTH)
               AS we
           FROM c)
         SELECT ws AS _wstart, count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sv
         FROM k WHERE ws <= t AND we > t GROUP BY ws ORDER BY _wstart""",
    "dialect_percentile_multi" ->
      """SELECT user_id,
           '[' || printf('%.6f', quantile_cont(value, 0.5)) || ', ' ||
           printf('%.6f', quantile_cont(value, 0.9)) || ', ' ||
           printf('%.6f', quantile_cont(value, 0.99)) || ']' AS p
         FROM events GROUP BY user_id ORDER BY user_id""",
    "dialect_statecount" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS ts2, value > 50 AS p,
           sum(CASE WHEN value > 50 THEN 0 ELSE 1 END)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS run FROM events),
         r AS (SELECT user_id, ts2, p, run,
           row_number() OVER (PARTITION BY user_id, run ORDER BY ts2)
             AS rn FROM t)
         SELECT ts2 AS ts, user_id,
           CASE WHEN NOT p THEN -1 WHEN run = 0 THEN rn
                ELSE rn - 1 END AS sc
         FROM r ORDER BY user_id, ts""",
    "dialect_stateduration" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS ts2, value <= 50 AS p,
           sum(CASE WHEN value <= 50 THEN 0 ELSE 1 END)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS run FROM events),
         r AS (SELECT user_id, ts2, p, run,
           min(CASE WHEN p THEN ts2 END)
             OVER (PARTITION BY user_id, run ORDER BY ts2
                   ROWS UNBOUNDED PRECEDING) AS ft FROM t)
         SELECT ts2 AS ts, user_id,
           CASE WHEN NOT p THEN -1
                ELSE (ts2 - ft) // 3600000000 END AS sd
         FROM r ORDER BY user_id, ts""",
    "dialect_keyless_series" ->
      """WITH t AS (SELECT epoch_us(ts) AS ts2, event_id, value
           FROM events WHERE user_id = 3),
         w AS (SELECT ts2, value,
           value - lag(value) OVER o AS d,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
             (o ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,2)) AS DOUBLE) AS cs,
           CASE WHEN count(value) OVER
               (o ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) = 4
             THEN round(CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
               (o ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE)
               / 4, 6) END AS ma,
           last_value(value IGNORE NULLS) OVER
             (o ROWS UNBOUNDED PRECEDING) AS ff
           FROM t WINDOW o AS (ORDER BY ts2, event_id))
         SELECT ts2 AS ts, d, cs, ma, ff FROM w ORDER BY ts""",
    "dialect_keyless_top" ->
      """SELECT epoch_us(ts) AS ts, value AS v FROM events
         ORDER BY value DESC, ts, event_id LIMIT 5""",
    "dialect_keyless_statecount" ->
      """WITH t AS (SELECT epoch_us(ts) AS ts2, value > 50 AS p,
           sum(CASE WHEN value > 50 THEN 0 ELSE 1 END)
             OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
             AS run
           FROM events WHERE user_id = 5),
         r AS (SELECT ts2, p, run,
           row_number() OVER (PARTITION BY run ORDER BY ts2) AS rn
           FROM t)
         SELECT ts2 AS ts,
           CASE WHEN NOT p THEN -1 WHEN run = 0 THEN rn
                ELSE rn - 1 END AS sc
         FROM r ORDER BY ts""",
    "dialect_lag_lead" ->
      """SELECT epoch_us(ts) AS ts, user_id,
           lag(value, 2, -1.5) OVER
             (PARTITION BY user_id ORDER BY ts) AS lv,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts) AS nv
         FROM events ORDER BY user_id, ts""",
    "dialect_keyless_lag_lead" ->
      """SELECT epoch_us(ts) AS ts,
           lead(value) OVER (ORDER BY ts, event_id) AS nv,
           lag(value, 1) OVER (ORDER BY ts, event_id) AS pv
         FROM events WHERE user_id = 7 ORDER BY ts""",
    "dialect_derivative" ->
      """WITH w AS (SELECT epoch_us(ts) AS ts2, user_id,
           (value - lag(value) OVER o) * 1000000 /
             (epoch_us(ts) - lag(epoch_us(ts)) OVER o) AS dv
           FROM events WINDOW o AS (PARTITION BY user_id ORDER BY ts))
         SELECT ts2 AS ts, user_id, dv FROM w
         WHERE dv IS NOT NULL AND dv >= 0 ORDER BY user_id, ts""",
    "dialect_order_hidden_key" ->
      """WITH b AS (SELECT user_id,
             epoch_us(ts) - epoch_us(ts) % 86400000000 AS ws
           FROM events)
         SELECT ws AS _wstart, count(*) AS n FROM b
         GROUP BY user_id, ws ORDER BY user_id, ws""",
    "dialect_over_bare_cols" ->
      """SELECT user_id, value, row_number() OVER
           (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
         FROM events WHERE user_id <= 2 ORDER BY user_id, rn""",
    "dialect_forecast_default" ->
      """WITH e AS (SELECT epoch_us(ts) AS tsu, value FROM events
             WHERE user_id = 2),
         c AS (SELECT min(tsu) AS mn, max(tsu) AS mx, count(*) AS n
           FROM e),
         c2 AS (SELECT mx,
             greatest(1000000, ((mx - mn) // (n - 1)) -
               (((mx - mn) // (n - 1)) % 1000000)) AS ev
           FROM c),
         c3 AS (SELECT mx + ev AS t0, ev // 1000000 AS step FROM c2),
         xm AS (SELECT tsu - (SELECT t0 FROM c3) AS d, value FROM e),
         -- FLOOR division (x is negative here; DuckDB // truncates
         -- toward zero, the engine's floorDiv floors)
         x AS (SELECT
             (d - (((d % 1000000) + 1000000) % 1000000)) // 1000000
               AS x, value
           FROM xm),
         st AS (SELECT count(*) AS n, max(x) AS xmax,
             CAST(CAST(sum(CAST(x AS DECIMAL(18,0))) AS DECIMAL(18,0)) AS DOUBLE) AS sx,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sy,
             CAST(CAST(sum(CAST(x AS DECIMAL(18,0)) *
               CAST(x AS DECIMAL(18,0))) AS DECIMAL(18,0)) AS DOUBLE) AS sxx,
             CAST(CAST(sum(CAST(x AS DECIMAL(18,0)) *
               CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sxy
           FROM x),
         p AS (SELECT *, (n*sxy - sx*sy) / (n*sxx - sx*sx) AS b
           FROM st),
         q AS (SELECT *, (sy - b*sx) / n AS a FROM p),
         f AS (SELECT a, b, xmax, unnest(range(1, 11)) AS j FROM q)
         SELECT (SELECT t0 FROM c3) +
             (xmax + j * (SELECT step FROM c3)) * 1000000 AS _frowts,
           round(a + b * (xmax + j * (SELECT step FROM c3)), 6) AS fc
         FROM f ORDER BY _frowts""",
    "dialect_partition_star_limit" ->
      """WITH r AS (SELECT *, row_number() OVER
             (PARTITION BY user_id ORDER BY ts) AS rn FROM events)
         SELECT epoch_us(ts) AS ts, event_id, user_id, event_type,
           value, props
         FROM r WHERE rn <= 2 ORDER BY user_id, event_id""",
    "dialect_count_window_sliding" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t,
            row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
          FROM events),
        e AS (SELECT user_id, t, unnest(range(
            CASE WHEN rn <= 50 THEN 0 ELSE (rn - 50 + 24) // 25 END,
            (rn - 1) // 25 + 1)) AS wid FROM t)
        SELECT user_id, min(t) AS _wstart, max(t) AS _wend,
          count(*) AS n
        FROM e GROUP BY user_id, wid
        ORDER BY user_id, _wstart, _wend""",
    "dialect_count_window_slide_cols" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t,
            row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
          FROM events WHERE event_type <> 'view'),
        e AS (SELECT user_id, t, unnest(range(
            CASE WHEN rn <= 50 THEN 0 ELSE (rn - 50 + 24) // 25 END,
            (rn - 1) // 25 + 1)) AS wid FROM t)
        SELECT user_id, min(t) AS _wstart, max(t) AS _wend,
          count(*) AS n
        FROM e GROUP BY user_id, wid
        ORDER BY user_id, _wstart, _wend""",
    "dialect_cols_star" ->
      """SELECT event_id, epoch_us(ts) AS ts, user_id, event_type,
           value, props, length(event_type) + 1 AS length_event_type_1
         FROM events WHERE event_id = 4999""",
    "dialect_chain_join" ->
      """SELECT a.event_id AS id, b.value AS v2, c.value AS v3
         FROM events a JOIN events b ON a.event_id = b.event_id
           JOIN events c ON b.event_id = c.event_id
         WHERE a.user_id = 8 ORDER BY id""",
    "dialect_comma_join3" ->
      """SELECT a.event_id AS id, b.value AS v2, c.value AS v3
         FROM events a, events b, events c
         WHERE a.event_id = b.event_id AND b.event_id = c.event_id
           AND a.user_id = 9
         ORDER BY id""",
    "dialect_window_projection" ->
      """SELECT (epoch_us(ts) - epoch_us(ts) % 3600000000) AS _wstart,
           (epoch_us(ts) - epoch_us(ts) % 3600000000) + 3600000000
             AS _wend,
           epoch_us(ts) AS tsu, event_id, round(value, 6) AS v
         FROM events WHERE user_id = 5 ORDER BY event_id""",
    "dialect_window_mode_scalar" ->
      """SELECT (epoch_us(ts) - epoch_us(ts) % 86400000000) AS _wstart,
           user_id
         FROM events ORDER BY user_id, _wstart""",
    "dialect_window_mode_agg" ->
      """SELECT DISTINCT
           (epoch_us(ts) - epoch_us(ts) % 86400000000) AS _wstart,
           user_id
         FROM events ORDER BY user_id, _wstart""",
    "dialect_join_noon" ->
      """SELECT a.event_id AS id, b.value AS v2
         FROM events a JOIN events b ON a.event_id = b.event_id
         WHERE a.user_id = 7 ORDER BY id""",
    "dialect_interval_auto" ->
      """SELECT 1704070000000000 + 3600000000 *
           ((epoch_us(ts) - 1704070000000000) // 3600000000)
           AS _wstart, count(*) AS n
         FROM events WHERE epoch_us(ts) >= 1704070000000000
         GROUP BY 1 ORDER BY 1""",
    "dialect_star_accompany" ->
      """SELECT arg_max(event_id, event_id) AS event_id,
           arg_max(epoch_us(ts), event_id) AS ts,
           arg_max(user_id, event_id) AS user_id,
           arg_max(event_type, event_id) AS event_type,
           arg_max(value, event_id) AS value,
           arg_max(props, event_id) AS props,
           max(event_id) AS me
         FROM events WHERE user_id = 3""",
    "dialect_select_accompany" ->
      """SELECT max(event_id) AS me,
           arg_max(user_id, event_id) AS user_id,
           arg_max(value, event_id) AS value
         FROM events WHERE user_id = 2""",
    "dialect_cal_interval_offset" ->
      """WITH t AS (SELECT date_trunc('month', ts - INTERVAL 7 DAY)
             AS m FROM events)
         SELECT epoch_us(m + INTERVAL 7 DAY) AS _wstart,
           count(*) AS n
         FROM t GROUP BY 1 ORDER BY 1""",
    "dialect_partition_rows_slimit" ->
      """WITH s AS (SELECT DISTINCT user_id FROM events
             WHERE user_id > 5 ORDER BY user_id LIMIT 2),
         r AS (SELECT e.user_id,
             row_number() OVER (PARTITION BY e.user_id
               ORDER BY e.user_id) AS rn
           FROM events e JOIN s ON e.user_id = s.user_id)
         SELECT user_id FROM r WHERE rn <= 3 ORDER BY user_id""",
    "dialect_group_slimit" ->
      """SELECT DISTINCT event_type AS tn FROM events
         ORDER BY tn LIMIT 2 OFFSET 1""",
    "dialect_cols_window" ->
      """WITH d AS (SELECT epoch_us(ts) AS t, value FROM events
           WHERE user_id = 3),
         w AS (SELECT t - (t % 86400000000) AS w, t, value,
             row_number() OVER (PARTITION BY t - (t % 86400000000)
               ORDER BY t DESC) AS rn
           FROM d)
         SELECT w, t AS lts, value AS lv FROM w WHERE rn = 1
         ORDER BY w""",
    "dialect_selection_row" ->
      """WITH s AS (SELECT * FROM events WHERE event_id <= 5000
           AND value IS NOT NULL
           ORDER BY value DESC, ts ASC, event_id ASC LIMIT 1)
         SELECT abs(value) AS av, round(value / 2, 3) AS hv,
           value AS mx, user_id AS u
         FROM s""",
    "dialect_selection_row_partition" ->
      """WITH r AS (SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn
           FROM events WHERE value IS NOT NULL)
         SELECT user_id, value AS fv, abs(value) AS av
         FROM r WHERE rn = 1 ORDER BY user_id""",
    "dialect_dquote_literals" ->
      """SELECT count(*) AS n,
           count(CASE WHEN event_type = 'view' THEN 1 END) AS nv
         FROM events WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
           AND ts < TIMESTAMP '2024-01-12 00:00:00'""",
    "dialect_selection_order_agg" ->
      """SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts, user_id,
           event_type, value, props,
           CAST(epoch_us(ts) + 2 AS BIGINT) AS lt
         FROM events ORDER BY ts DESC LIMIT 1""",
    "dialect_last_row_ride" ->
      """SELECT event_id AS last_row_event_id,
           CAST(epoch_us(ts) AS BIGINT) AS last_row_ts,
           user_id AS last_row_user_id,
           event_type AS last_row_event_type,
           value AS last_row_value, props AS last_row_props,
           CAST(epoch_us(ts) AS BIGINT) AS ts, 'k' AS k
         FROM events ORDER BY ts DESC LIMIT 1""",
    "dialect_partition_having" ->
      """SELECT event_type FROM events GROUP BY event_type
         HAVING count(*) >= 0 ORDER BY event_type""",
    "dialect_cal_offset_sliding" ->
      """WITH g AS (SELECT 1209600000000 * j + 604800000000 AS st
             FROM range(1390, 1420) t(j))
         SELECT CAST(st AS BIGINT) AS w, count(*) AS n
         FROM events, g
         WHERE epoch_us(ts) >= st
           AND ts < make_timestamp(st) + INTERVAL 1 MONTH
         GROUP BY st ORDER BY w""",
    "dialect_quantified_subq" ->
      """SELECT event_id FROM events
         WHERE value > ALL (SELECT value FROM events WHERE event_id <= 3)
           AND user_id = ANY (SELECT user_id FROM events
                              WHERE event_id <= 200)
         ORDER BY event_id""",
    "dialect_slimit_nokey" ->
      """SELECT count(*) AS n FROM events
         WHERE ts IS NOT NULL AND user_id IN
           (SELECT DISTINCT user_id FROM events WHERE ts IS NOT NULL
            ORDER BY user_id LIMIT 2)""",
    "dialect_sjoin_chain" ->
      """SELECT CAST(epoch_us(a.ts) AS BIGINT) AS ts
         FROM events a JOIN events c ON a.ts = c.ts
         ORDER BY 1 LIMIT 20""",
    "dialect_window_join_json_key" ->
      """SELECT CAST(epoch_us(a.ts) AS BIGINT) AS ts, count(b.value) AS n
         FROM events a LEFT JOIN events b
           ON a.user_id = b.user_id
          AND json_extract_string(a.props, '$.k') =
              json_extract_string(b.props, '$.k')
          AND b.ts >= a.ts
          AND epoch_us(b.ts) <= epoch_us(a.ts) + 30000000
         GROUP BY a.ts ORDER BY ts""",
    "dialect_indef_count_window" ->
      """WITH d AS (SELECT epoch_us(ts) AS t, value,
             CAST((row_number() OVER (ORDER BY epoch_us(ts)) - 1) // 3
               AS BIGINT) AS wid
           FROM events WHERE user_id = 3),
         p AS (SELECT t, wid, value <= 50 AS ok,
             min(t) OVER (PARTITION BY wid) AS ws,
             max(t) OVER (PARTITION BY wid) AS we
           FROM d),
         g AS (SELECT t, wid, ok, ws, we,
             count(*) FILTER (WHERE NOT ok)
               OVER (PARTITION BY wid ORDER BY t
                     ROWS UNBOUNDED PRECEDING) AS falses
           FROM p)
         SELECT CAST(t AS BIGINT) AS ts, CAST(ws AS BIGINT) AS w,
           CAST(we - ws AS BIGINT) AS wd,
           CASE WHEN ok THEN CAST(row_number() OVER
               (PARTITION BY wid, falses, ok ORDER BY t) AS BIGINT)
             ELSE CAST(-1 AS BIGINT) END AS sc
         FROM g ORDER BY ts""",
    "dialect_indef_session" ->
      """WITH d AS (SELECT epoch_us(ts) AS t, event_id FROM events
           WHERE user_id = 3),
         m AS (SELECT t, event_id,
             CASE WHEN t - lag(t) OVER (ORDER BY t) > 600000000
                   OR lag(t) OVER (ORDER BY t) IS NULL
                 THEN 1 ELSE 0 END AS isnew
           FROM d),
         s AS (SELECT t, event_id,
             sum(isnew) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
               AS sid
           FROM m)
         SELECT CAST(t AS BIGINT) AS ts,
           CAST(min(t) OVER (PARTITION BY sid) AS BIGINT) AS w,
           CAST(sum(event_id) OVER (PARTITION BY sid ORDER BY t
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
         FROM s ORDER BY ts""",
    "dialect_to_timestamp_col" ->
      """SELECT event_id,
           TIMESTAMP '2025-03-04 15:06:07.123' AS t
         FROM events WHERE event_id < 5 ORDER BY event_id""",
    "dialect_indef_interval_fill" ->
      """WITH d AS (SELECT user_id, epoch_us(ts) AS t, event_id
           FROM events
           WHERE epoch_us(ts) >= 1704067200000000
             AND epoch_us(ts) < 1704326400000000),
         w AS (SELECT user_id, t - (t % 21600000000) AS w,
             CAST(sum(event_id) OVER (
               PARTITION BY user_id, t - (t % 21600000000)
               ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
           FROM d),
         grid AS (SELECT u.user_id, g.w
           FROM (SELECT DISTINCT user_id FROM d) u
           CROSS JOIN (SELECT unnest(range(1704067200000000,
             1704326400000000, 21600000000)) AS w) g),
         miss AS (SELECT user_id, w FROM grid
           EXCEPT SELECT user_id, w FROM w)
         SELECT user_id, w, cs FROM w
         UNION ALL
         SELECT user_id, w, CAST(0 AS BIGINT) AS cs FROM miss
         ORDER BY user_id, w, cs""",
    "dialect_slimit_groupby" ->
      """WITH g AS (SELECT user_id, count(*) AS n,
             CAST(sum(event_id) AS BIGINT) AS se
           FROM events GROUP BY user_id),
         s AS (SELECT user_id FROM g ORDER BY user_id
           LIMIT 3 OFFSET 1)
         SELECT g.user_id, g.n, g.se FROM g JOIN s USING (user_id)
         ORDER BY g.user_id""",
    "dialect_session_raw" ->
      """SELECT epoch_us(ts) AS ts, event_id, value FROM events
         WHERE user_id = 5 ORDER BY event_id""",
    "dialect_interp_value_multi" ->
      """SELECT unnest(range(1704067200000000, 1704070200000001,
             600000000)) AS _irowts,
           10.0 AS v1, 20.0 AS v2 ORDER BY _irowts""",
    "dialect_sliding_ns_unit" ->
      """WITH e AS (SELECT epoch_us(ts) AS tsu FROM events
             WHERE user_id = 3),
         c AS (SELECT tsu,
             (tsu - tsu % 43200000000 - k * 43200000000) AS ws
           FROM e, (SELECT unnest([0, 1]) AS k) u)
         SELECT ws AS _wstart, count(*) AS n FROM c
         WHERE ws <= tsu AND tsu < ws + 86400000000
         GROUP BY ws ORDER BY ws""",
    "dialect_join_residual" ->
      """SELECT epoch_us(t1.ts) AS ts, t1.event_id, t2.value AS v2
         FROM events t1 LEFT JOIN events t2
           ON t1.event_id = t2.event_id AND t2.value > 50
         WHERE t1.user_id = 3 ORDER BY t1.event_id""",
    "dialect_anti_residual" ->
      """SELECT count(*) AS n
         FROM events t1 ANTI JOIN events t2
           ON t1.event_id = t2.event_id AND t2.value > 50""",
    "dialect_full_join_residual" ->
      """SELECT t2.event_id AS id2, t2.value AS v2, t1.value AS v1
         FROM events t1 FULL JOIN events t2
           ON t1.event_id = t2.event_id
             AND t2.value > 50 AND t1.value > 50
         WHERE t1.user_id = 6 OR t2.user_id = 6
         ORDER BY id2 NULLS FIRST, v1 NULLS FIRST""",
    "dialect_subquery_join" ->
      """SELECT a.event_type, a.n1, b.n2 AS n2
         FROM (SELECT event_type, count(*) AS n1 FROM events
               WHERE user_id = 1 GROUP BY event_type) a
         JOIN (SELECT event_type, count(*) AS n2 FROM events
               WHERE user_id = 2 GROUP BY event_type) b
           ON a.event_type = b.event_type
         ORDER BY a.event_type""",
    "dialect_window_join_onfirst" ->
      """WITH l AS (SELECT * FROM events WHERE user_id = 4),
         j AS (SELECT l.ts, l.event_id, r.value AS v2, r.ts AS rts,
                 row_number() OVER (PARTITION BY l.event_id
                   ORDER BY r.ts, r.event_id, r.event_type, r.value,
                     r.props) AS rn
               FROM l LEFT JOIN events r ON l.user_id = r.user_id
                 AND r.ts >= l.ts - INTERVAL 5 SECOND
                 AND r.ts <= l.ts + INTERVAL 5 SECOND)
         SELECT epoch_us(ts) AS ts, event_id, v2 FROM j
         WHERE rn <= 2 OR rts IS NULL
         ORDER BY event_id, v2 NULLS FIRST""",
    "dialect_fromless" ->
      """SELECT '3.3.6.0' AS sv, 'default' AS db, 1+1 AS s,
           'A' AS c, mod(10, 3) AS m,
           CAST(position('b' in 'abc') AS BIGINT) AS p,
           round(pi(), 6) AS pie, CAST(abs(-3.5) AS DOUBLE) AS a,
           count(*) AS n, avg(2) AS av,
           CAST(greatest(1, 5, 3) AS BIGINT) AS g""",
    "dialect_mode_ride" ->
      """WITH c AS (SELECT event_type, user_id, count(*) n
           FROM events GROUP BY 1, 2),
         w AS (SELECT event_type, user_id FROM c
           QUALIFY row_number() OVER (PARTITION BY event_type
             ORDER BY n DESC, user_id DESC) = 1)
         SELECT e.event_type AS event_type, epoch_us(e.ts) AS ts,
           e.user_id AS mv
         FROM events e JOIN w ON e.event_type = w.event_type
           AND e.user_id = w.user_id
         QUALIFY row_number() OVER (PARTITION BY e.event_type
           ORDER BY e.ts DESC) = 1
         ORDER BY 1""",
    "dialect_truthy_greatest" ->
      """SELECT event_id,
           CAST(CASE WHEN value <> 0 THEN 1 ELSE 0 END AS BIGINT) AS cw,
           CAST(NULL AS BIGINT) AS cz,
           '2' AS gs, '10' AS ls,
           CAST(NULL AS BIGINT) AS gn,
           CAST(0 AS BIGINT) AS sl
         FROM events WHERE user_id = 3 ORDER BY event_id""",
    "dialect_first_star" ->
      """SELECT arg_min(event_id, ts) AS first_event_id,
           epoch_us(arg_min(ts, ts)) AS first_ts,
           arg_min(user_id, ts) AS first_user_id,
           arg_min(event_type, ts) AS first_event_type,
           arg_min(value, ts) AS first_value,
           arg_min(props, ts) AS first_props
         FROM events""",
    "dialect_tbname" ->
      """SELECT 'events' AS tbname, count(*) AS n FROM events
         ORDER BY tbname""",
    "dialect_tbname_agg" ->
      """SELECT 'events' AS tbname, count(*) AS n,
           min(user_id) AS mu FROM events""",
    "dialect_datetime_loose" ->
      """SELECT count(*) AS n, min(epoch_us(ts)) AS mn FROM events
         WHERE ts >= TIMESTAMP '2024-01-05 06:03:02'
           AND ts < TIMESTAMP '2024-01-09 18:04:05.250'""",
    "dialect_star_subquery" ->
      """WITH s AS (SELECT user_id,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) /
             count(value) AS a FROM events GROUP BY user_id)
         SELECT * FROM s WHERE a > 20 ORDER BY user_id""",
    "dialect_rowts" ->
      """SELECT epoch_us(ts) AS rts, value FROM events WHERE user_id = 1
         ORDER BY rts LIMIT 50""",
    "dialect_top_groupby" ->
      """WITH r AS (SELECT epoch_us(ts) AS ts, user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id
             ORDER BY value DESC, ts ASC, event_id ASC) AS rn
           FROM events)
         SELECT ts, user_id, event_id, value AS v FROM r WHERE rn <= 2
         ORDER BY user_id, v DESC, ts, event_id""",
    "dialect_apercentile_algo" ->
      """SELECT user_id, true AS ok50, count(*) AS n FROM events
         GROUP BY user_id ORDER BY user_id""",
    "dialect_histogram" ->
      """WITH bins(lower_bin, upper_bin) AS
           (VALUES (0.0,10.0),(10.0,50.0),(50.0,100.0),(100.0,500.0)),
         u AS (SELECT DISTINCT user_id FROM events)
         SELECT u.user_id, CAST(b.lower_bin AS DOUBLE) AS lower_bin,
           CAST(b.upper_bin AS DOUBLE) AS upper_bin,
           (SELECT count(*) FROM events e WHERE e.user_id = u.user_id
              AND e.value > b.lower_bin AND e.value <= b.upper_bin)
             AS cnt
         FROM u CROSS JOIN bins b ORDER BY user_id, lower_bin""",
    "dialect_histogram_linear" ->
      """WITH bins(lower_bin, upper_bin) AS (VALUES
           (CAST('-infinity' AS DOUBLE), 0.0), (0.0,100.0),
           (100.0,200.0), (200.0,300.0), (300.0,400.0),
           (400.0, CAST('infinity' AS DOUBLE)))
         SELECT CAST(lower_bin AS DOUBLE) AS lower_bin,
           CAST(upper_bin AS DOUBLE) AS upper_bin,
           (SELECT count(*) FROM events e
              WHERE e.value > b.lower_bin AND e.value <= b.upper_bin)
             AS cnt
         FROM bins b ORDER BY lower_bin""",
    "dialect_histogram_log" ->
      """WITH bins(lower_bin, upper_bin) AS (VALUES
           (1.0,4.0),(4.0,16.0),(16.0,64.0),(64.0,256.0),(256.0,1024.0)),
         c AS (SELECT CAST(b.lower_bin AS DOUBLE) AS lower_bin,
           CAST(b.upper_bin AS DOUBLE) AS upper_bin,
           (SELECT count(*) FROM events e
              WHERE e.value > b.lower_bin AND e.value <= b.upper_bin)
             AS n
           FROM bins b)
         SELECT lower_bin, upper_bin,
           CASE WHEN sum(n) OVER () = 0 THEN 0.0
                ELSE CAST(n AS DOUBLE)
                  / CAST(CAST(sum(n) OVER () AS BIGINT) AS DOUBLE)
           END AS percentage
         FROM c ORDER BY lower_bin""")
}
