package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.{AnalyticsOps, BuiltinDetector, Detector, TimeOps}
import graft.ops.TimeOps.Dur

/** TDgpt-equivalent analytics queries (SURVEY §2.10 forecast /
  * imputation / anomaly; §2.5 ANOMALY_WINDOW) plus dtw_path, over the
  * `events` table. */
object Analytics {
  import Lowering.usToMs

  private val T0: Long = 1704067200000000L

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queriesWith(BuiltinDetector)

  /** The analytics queries bound to a [[Detector]]: swapping in a
    * learned model (tanalytics.h anode shape) touches no query code —
    * see DetectorSpec. */
  def queriesWith(det: Detector)
      : Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- FORECAST(value): per-user linear trend, 6 daily steps ----
    "forecast_linear" -> { (s, dir) =>
      det.forecast(ev(s, dir), col("ts"), "value", Seq("user_id"),
          horizon = 6, stepUs = Dur.d, t0Us = T0)
        .select(col("user_id"), usToMs(col("_frowts")).as("_frowts_ms"),
          round(col("forecast"), 6).as("forecast"),
          round(col("_flow"), 6).as("_flow"),
          round(col("_fhigh"), 6).as("_fhigh"))
        .orderBy(col("user_id"), col("_frowts_ms"))
    },
    // ---- FORECAST(value) algo=holtwinters: Holt linear-trend double
    // exponential smoothing, DuckDB recursive-CTE oracle ----
    "forecast_holt" -> { (s, dir) =>
      graft.ops.AnalyticsOps.forecastHolt(ev(s, dir), col("ts"), "value",
          Seq("user_id"), horizon = 3, stepUs = Dur.d, t0Us = T0,
          tieBreak = Seq("event_id"))
        .select(col("user_id"), usToMs(col("_frowts")).as("_frowts_ms"),
          round(col("forecast"), 6).as("forecast"))
        .orderBy(col("user_id"), col("_frowts_ms"))
    },
    // ---- FORECAST(value) algo=arima: AR(1)-with-mean closed form ----
    "forecast_arima" -> { (s, dir) =>
      graft.ops.AnalyticsOps.forecastAr1(ev(s, dir), col("ts"), "value",
          Seq("user_id"), horizon = 3, stepUs = Dur.d, t0Us = T0)
        .select(col("user_id"), usToMs(col("_frowts")).as("_frowts_ms"),
          round(col("forecast"), 6).as("forecast"))
        .orderBy(col("user_id"), col("_frowts_ms"))
    },
    // ---- IMPUTATION(value): nulls planted at event_id % 7 = 0 ----
    "imputation_linear" -> { (s, dir) =>
      val gapped = ev(s, dir).withColumn("value",
        when(col("event_id") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("value").cast("double")))
      det.imputeLinear(gapped, col("ts"), "value", Seq("user_id"))
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("event_id"),
          round(col("value"), 6).as("value"), col("_impmark"))
        .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
    },
    // ---- IMPUTATION with no partition key: the whole table is one
    // globally-ordered series, so the prev/next carries run as
    // GlobalScan two-pass scans, not a single-partition window ----
    "imputation_keyless" -> { (s, dir) =>
      val gapped = ev(s, dir).withColumn("value",
        when(col("event_id") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("value").cast("double")))
      AnalyticsOps.imputeLinear(gapped, col("ts"), "value", Nil,
          tieBreak = Seq("event_id"))
        .select(usToMs(col("ts")).as("ts_ms"), col("event_id"),
          round(col("value"), 6).as("value"), col("_impmark"))
        .orderBy(col("ts_ms"), col("event_id"))
    },
    // ---- ANOMALY_WINDOW(value): z=2 score, runs merge into windows ----
    "anomaly_window" -> { (s, dir) =>
      det.anomalyRows(ev(s, dir), col("ts"), "value",
          Seq("user_id"), z = 2.0)
        .groupBy(col("user_id"), col("_wgrp"))
        .agg(min(col("ts")).as("_w_us"),
          usToMs(min(col("ts"))).as("_wstart_ms"),
          usToMs(max(col("ts"))).as("_wend_ms"),
          count(lit(1)).as("n"))
        // order on the exact µs start — ms-floored starts can collide
        // between short dense runs at larger scale factors
        .orderBy(col("user_id"), col("_w_us"))
        .select(col("user_id"), col("_wstart_ms"), col("_wend_ms"), col("n"))
    },
    // ---- ANOMALY_WINDOW with no partition key: global mean/σ come
    // from a one-row scalar aggregate broadcast onto the rows, and the
    // two row numberings ride GlobalScan — no single-partition window ----
    "anomaly_window_keyless" -> { (s, dir) =>
      AnalyticsOps.anomalyRows(ev(s, dir), col("ts"), "value",
          Nil, z = 2.0, tieBreak = Seq("event_id"))
        .groupBy(col("_wgrp"))
        .agg(min(col("ts")).as("_w_us"),
          usToMs(min(col("ts"))).as("_wstart_ms"),
          usToMs(max(col("ts"))).as("_wend_ms"),
          count(lit(1)).as("n"))
        .orderBy(col("_w_us"))
        .select(col("_wstart_ms"), col("_wend_ms"), col("n"))
    },
    // ---- dtw_path: warping path of each user's series vs user 0 ----
    "sf_dtw_path" -> { (s, dir) =>
      val dec = (c: org.apache.spark.sql.Column) =>
        c.cast(org.apache.spark.sql.types.DecimalType(18, 2))
      val hourly = ev(s, dir)
        .withColumn("bucket", col("ts") - pmod(col("ts"), lit(Dur.h)))
        .groupBy(col("user_id"), col("bucket"))
        .agg((sum(dec(col("value"))).cast("double") / count(lit(1))).as("v"))
        .groupBy(col("user_id"))
        .agg(transform(array_sort(collect_list(struct(col("bucket"), col("v")))),
          x => x.getField("v")).as("series"))
      val ref = hourly.orderBy(col("user_id")).limit(1)
        .select(col("series").as("ref_series"))
      hourly.crossJoin(broadcast(ref))
        .select(col("user_id"),
          graft.functions.Aggregators.dtwPathUdf(
            slice(col("series"), 1, 48), slice(col("ref_series"), 1, 48))
            .as("path"))
        // the path is bit-deterministic (canonical diagonal-first tie
        // break), so its JSON fingerprints to a pinnable literal — the
        // oracle checks md5 + length instead of the ~1 KB raw string
        .select(col("user_id"), size(col("path")).as("path_len"),
          md5(to_json(col("path"))).as("path_md5"))
        .orderBy(col("user_id"))
    })

  def oracleSql: Map[String, String] = Map(
    "forecast_linear" -> {
      val x = s"(epoch_us(ts) - $T0) // 1000000"
      s"""WITH st AS (
            SELECT user_id, count(*) AS n, max($x) AS xmax,
              CAST(CAST(sum(CAST($x AS DECIMAL(18,0))) AS DECIMAL(18,0)) AS DOUBLE) AS sx,
              CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sy,
              CAST(CAST(sum(CAST($x AS DECIMAL(18,0)) * CAST($x AS DECIMAL(18,0))) AS DECIMAL(18,0)) AS DOUBLE) AS sxx,
              CAST(CAST(sum(CAST($x AS DECIMAL(18,0)) * CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sxy,
              CAST(CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS syy
            FROM events GROUP BY user_id),
          p AS (SELECT *, (n*sxy - sx*sy) / (n*sxx - sx*sx) AS b FROM st),
          q AS (SELECT *, (sy - b*sx) / n AS a FROM p),
          r AS (SELECT *, syy - 2*a*sy - 2*b*sxy + n*a*a + 2*a*b*sx + b*b*sxx
            AS sse FROM q),
          s AS (SELECT *, sqrt(greatest(sse, 0) / (n - 2)) AS sigma FROM r),
          f AS (SELECT user_id, a, b, sigma, xmax,
            unnest(range(1, 7)) AS j FROM s)
          SELECT user_id,
            ($T0 + (xmax + j*86400) * 1000000) // 1000 AS _frowts_ms,
            round(a + b*(xmax + j*86400), 6) AS forecast,
            round(a + b*(xmax + j*86400) - 1.96*sigma, 6) AS _flow,
            round(a + b*(xmax + j*86400) + 1.96*sigma, 6) AS _fhigh
          FROM f ORDER BY user_id, _frowts_ms"""
    },
    // Holt recursion replayed in DuckDB as a recursive CTE, stepping
    // rn -> rn+1 per series; literals written in the exact operation
    // order of the Scala fold ((1 - 0.3), not 0.7 — they differ in the
    // last ulp) so both engines produce bit-identical doubles
    "forecast_holt" -> {
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
          SELECT user_id,
            ($T0 + (h - 1) * ${24L * 3600000000L}) // 1000 AS _frowts_ms,
            round(l + h * b, 6) AS forecast
          FROM fin CROSS JOIN hs
          ORDER BY user_id, _frowts_ms"""
    },
    // AR(1) sufficient statistics in exact DECIMAL sums; double
    // expressions in the same operation order as the Scala lowering,
    // phi powers by repeated multiplication (libm pow is not
    // correctly-rounded and may differ between engines)
    "forecast_arima" -> {
      s"""WITH p AS (
            SELECT user_id, CAST(value AS DECIMAL(18,2)) AS yd,
              lag(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts) AS pv,
              row_number() OVER (PARTITION BY user_id ORDER BY ts DESC)
                AS rdesc
            FROM events),
          st AS (
            SELECT user_id, count(*) AS n,
              CAST(CAST(sum(yd) AS DECIMAL(18,2)) AS DOUBLE) AS sy,
              CAST(max(CASE WHEN rdesc = 1 THEN yd END) AS DOUBLE)
                AS last_y,
              CAST(CAST(sum(CASE WHEN pv IS NOT NULL THEN yd END)
                AS DECIMAL(18,2)) AS DOUBLE) AS sa,
              CAST(CAST(sum(pv) AS DECIMAL(18,2)) AS DOUBLE) AS sb,
              CAST(CAST(sum(pv * pv) AS DECIMAL(18,4)) AS DOUBLE) AS sbb,
              CAST(CAST(sum(yd * pv) AS DECIMAL(18,4)) AS DOUBLE) AS sab,
              count(pv) AS m
            FROM p GROUP BY user_id),
          ph AS (
            SELECT user_id, sy / n AS mu, last_y,
              CASE WHEN sbb - (sy/n) * sb - (sy/n) * sb
                     + m * (sy/n) * (sy/n) = 0 THEN 0.0
                   ELSE (sab - (sy/n) * sa - (sy/n) * sb
                     + m * (sy/n) * (sy/n))
                    / (sbb - (sy/n) * sb - (sy/n) * sb
                     + m * (sy/n) * (sy/n)) END AS phi
            FROM st),
          f AS (
            SELECT user_id, 1 AS h, mu + phi * (last_y - mu) AS fc FROM ph
            UNION ALL
            SELECT user_id, 2, mu + phi * phi * (last_y - mu) FROM ph
            UNION ALL
            SELECT user_id, 3, mu + phi * phi * phi * (last_y - mu)
            FROM ph)
          SELECT user_id,
            ($T0 + (h - 1) * ${24L * 3600000000L}) // 1000 AS _frowts_ms,
            round(fc, 6) AS forecast
          FROM f ORDER BY user_id, _frowts_ms"""
    },
    "imputation_linear" ->
      """WITH d AS (SELECT user_id, epoch_us(ts) AS t, event_id,
            CASE WHEN event_id % 7 = 0 THEN NULL
                 ELSE CAST(value AS DOUBLE) END AS y
          FROM events),
        m AS (SELECT user_id, t, event_id, y,
            last_value(CASE WHEN y IS NOT NULL
                THEN struct_pack(t := t, v := y) END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
            first_value(CASE WHEN y IS NOT NULL
                THEN struct_pack(t := t, v := y) END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY t
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
          FROM d)
        SELECT user_id, t // 1000 AS ts_ms, event_id,
          round(CASE WHEN y IS NOT NULL THEN y
            WHEN pv IS NULL AND nv IS NULL THEN NULL
            WHEN pv IS NULL THEN nv.v
            WHEN nv IS NULL THEN pv.v
            ELSE pv.v + (nv.v - pv.v) * CAST(t - pv.t AS DOUBLE)
              / CAST(nv.t - pv.t AS DOUBLE) END, 6) AS value,
          y IS NULL AS _impmark
        FROM m ORDER BY user_id, ts_ms, event_id""",
    // pinned literal table — see PinnedOracles / tools/gen_dtw_oracle.py
    "sf_dtw_path" -> PinnedOracles.sfDtwPath,
    "imputation_keyless" ->
      """WITH d AS (SELECT epoch_us(ts) AS t, event_id,
            CASE WHEN event_id % 7 = 0 THEN NULL
                 ELSE CAST(value AS DOUBLE) END AS y
          FROM events),
        m AS (SELECT t, event_id, y,
            last_value(CASE WHEN y IS NOT NULL
                THEN struct_pack(t := t, v := y) END IGNORE NULLS)
              OVER (ORDER BY t, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
            first_value(CASE WHEN y IS NOT NULL
                THEN struct_pack(t := t, v := y) END IGNORE NULLS)
              OVER (ORDER BY t, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
          FROM d)
        SELECT t // 1000 AS ts_ms, event_id,
          round(CASE WHEN y IS NOT NULL THEN y
            WHEN pv IS NULL AND nv IS NULL THEN NULL
            WHEN pv IS NULL THEN nv.v
            WHEN nv IS NULL THEN pv.v
            ELSE pv.v + (nv.v - pv.v) * CAST(t - pv.t AS DOUBLE)
              / CAST(nv.t - pv.t AS DOUBLE) END, 6) AS value,
          y IS NULL AS _impmark
        FROM m ORDER BY ts_ms, event_id""",
    "anomaly_window" ->
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
        ORDER BY user_id, min(t)""",
    "anomaly_window_keyless" ->
      """WITH s AS (SELECT
            CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sy,
            CAST(CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS syy,
            count(*) AS n
          FROM events),
        f AS (SELECT epoch_us(e.ts) AS t, e.event_id,
            abs(CAST(e.value AS DOUBLE) - s.sy/s.n) >
              2.0 * sqrt((s.syy - s.sy*s.sy/s.n)/s.n) AS an,
            row_number() OVER (ORDER BY e.ts, e.event_id) AS rn
          FROM events e CROSS JOIN s),
        a AS (SELECT t, rn,
            row_number() OVER (ORDER BY t, event_id) AS rna
          FROM f WHERE an)
        SELECT min(t) // 1000 AS _wstart_ms,
          max(t) // 1000 AS _wend_ms, count(*) AS n
        FROM a GROUP BY rn - rna
        ORDER BY min(t)""")
}
