package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.ops.SeriesOps
import graft.ops.TimeOps.Dur

/** Scalar + aggregate/selection function surface (SURVEY.md §2.9, §2.10):
  * the indef-rows functions (diff/derivative/csum/mavg/statecount/
  * stateduration/top/bottom/tail/unique), selection aggregates
  * (first/last/spread/elapsed/mode/percentile/histogram/twa/irate/
  * leastsquares/corr/stddev/group_concat), and the math/string/datetime
  * scalar families — all over Spark built-ins or the SeriesOps window
  * lowerings; no UDFs in any hot path.
  */
object Functions {
  import Lowering._

  private val T0: Long = 1704067200000000L // 2024-01-01 UTC, µs

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  private val uKey = Seq(col("user_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- diff (builtins.c:4221) ----
    "sf_diff" -> { (s, dir) =>
      ev(s, dir)
        .withColumn("diff_v", SeriesOps.diff(col("value"), col("ts"), uKey))
        .filter(col("diff_v").isNotNull)
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("diff_v"))
        .orderBy(col("user_id"), col("ts_ms"))
    },
    // ---- derivative per second (builtins.c:3603) ----
    "sf_derivative" -> { (s, dir) =>
      ev(s, dir)
        .withColumn("deriv",
          SeriesOps.derivative(col("value"), col("ts"), uKey, Dur.s))
        .filter(col("deriv").isNotNull)
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("deriv"))
        .orderBy(col("user_id"), col("ts_ms"))
    },
    // ---- csum (builtins.c:4343): decimal accumulation, exact ----
    "sf_csum" -> { (s, dir) =>
      ev(s, dir)
        .withColumn("csum",
          SeriesOps.csum(dec(col("value")), col("ts"), uKey).cast("double"))
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("csum"))
        .orderBy(col("user_id"), col("ts_ms"))
    },
    // ---- mavg(7) (builtins.c:4368) ----
    "sf_mavg" -> { (s, dir) =>
      ev(s, dir)
        .withColumn("mavg", SeriesOps.mavg(col("value"), col("ts"), uKey, 7))
        .filter(col("mavg").isNotNull)
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("mavg"))
        .orderBy(col("user_id"), col("ts_ms"))
    },
    // ---- statecount / stateduration (builtins.c:4256-4296) ----
    "sf_statecount" -> { (s, dir) =>
      ev(s, dir)
        .withColumn("sc",
          SeriesOps.statecount(col("value") > 50, col("ts"), uKey))
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("sc"))
        .orderBy(col("user_id"), col("ts_ms"))
    },
    "sf_stateduration" -> { (s, dir) =>
      ev(s, dir)
        .withColumn("sd",
          SeriesOps.stateduration(col("value") > 50, col("ts"), uKey, Dur.s))
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("sd"))
        .orderBy(col("user_id"), col("ts_ms"))
    },
    // ---- top / bottom (builtins.c:3371) ----
    "sf_top" -> { (s, dir) =>
      SeriesOps.topK(ev(s, dir), col("value"), col("ts"), uKey, 3,
          tie = Seq(col("event_id")))
        .select(col("user_id"), col("_rank"), usToMs(col("ts")).as("ts_ms"),
          col("value"))
        .orderBy(col("user_id"), col("_rank"))
    },
    "sf_bottom" -> { (s, dir) =>
      SeriesOps.topK(ev(s, dir), col("value"), col("ts"), uKey, 3,
          bottom = true, tie = Seq(col("event_id")))
        .select(col("user_id"), col("_rank"), usToMs(col("ts")).as("ts_ms"),
          col("value"))
        .orderBy(col("user_id"), col("_rank"))
    },
    // ---- tail(5, 2) (builtins.c:4431) ----
    "sf_tail" -> { (s, dir) =>
      SeriesOps.tail(ev(s, dir), col("ts"), uKey, 5, 2,
          tie = Seq(col("event_id")))
        .select(col("user_id"), col("_rank"), usToMs(col("ts")).as("ts_ms"),
          col("event_id"))
        .orderBy(col("user_id"), col("_rank"))
    },
    // ---- unique (builtins.c:4471) ----
    "sf_unique" -> { (s, dir) =>
      SeriesOps.unique(ev(s, dir), col("event_type"), col("ts"), uKey,
          tie = Seq(col("event_id")))
        .select(col("user_id"), col("event_type"),
          usToMs(col("ts")).as("first_ts_ms"))
        .orderBy(col("user_id"), col("event_type"))
    },
    // ---- first/last/last_row by ts (builtins.c:3736-4007) ----
    "sf_first_last" -> { (s, dir) =>
      ev(s, dir).groupBy(col("user_id"))
        .agg(min_by(col("value"), col("ts")).as("first_v"),
          max_by(col("value"), col("ts")).as("last_v"),
          usToMs(min(col("ts"))).as("first_ts_ms"),
          usToMs(max(col("ts"))).as("last_ts_ms"))
        .orderBy(col("user_id"))
    },
    // ---- spread / elapsed (builtins.c:3441, 3516) ----
    "sf_spread_elapsed" -> { (s, dir) =>
      ev(s, dir).groupBy(col("user_id"))
        .agg((max(col("value")) - min(col("value"))).as("spread_v"),
          usToMs(max(col("ts")) - min(col("ts"))).as("elapsed_ms"))
        .orderBy(col("user_id"))
    },
    // ---- mode with deterministic tie-break (builtins.c:4493) ----
    "sf_mode" -> { (s, dir) =>
      val counts = ev(s, dir).groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("event_type").desc)
      counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_v"), col("n"))
        .orderBy(col("user_id"))
    },
    // ---- exact percentile (builtins.c:3216) ----
    "sf_percentile" -> { (s, dir) =>
      ev(s, dir).groupBy(col("user_id"))
        .agg(round(percentile(col("value"), lit(0.5)), 6).as("p50"),
          round(percentile(col("value"), lit(0.9)), 6).as("p90"))
        .orderBy(col("user_id"))
    },
    // ---- percentile multi-arg: one sort, several outputs ----
    "sf_percentile_multi" -> { (s, dir) =>
      ev(s, dir).groupBy(col("user_id"))
        .agg(percentile(col("value"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.95))).as("_p"))
        .select(col("user_id"),
          round(element_at(col("_p"), 1), 6).as("p25"),
          round(element_at(col("_p"), 2), 6).as("p50"),
          round(element_at(col("_p"), 3), 6).as("p75"),
          round(element_at(col("_p"), 4), 6).as("p95"))
        .orderBy(col("user_id"))
    },
    // ---- histogram, linear bins of width 20 (builtins.c:4032) ----
    "sf_histogram" -> { (s, dir) =>
      ev(s, dir)
        .withColumn("bucket",
          least(greatest(floor(col("value") / 20), lit(0)), lit(9))
            .cast(LongType))
        .groupBy(col("user_id"), col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("user_id"), col("bucket"))
    },
    // ---- twa: trapezoid time-weighted average (builtins.c:4008) ----
    "sf_twa" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val pv = lag(col("value"), 1).over(w)
      val pt = lag(col("ts"), 1).over(w)
      // exact decimal: (v+prev) is rounded to cents once; dt fits
      // DECIMAL(18,0); the scale-2 products sum exactly.
      val contrib = (col("value") + pv).cast(DecimalType(18, 2)) *
        (col("ts") - pt).cast(DecimalType(18, 0))
      ev(s, dir)
        .withColumn("_contrib", contrib)
        .groupBy(col("user_id"))
        .agg(sum(col("_contrib")).cast("double").as("area2"),
          (max(col("ts")) - min(col("ts"))).cast("double").as("span"))
        .select(col("user_id"), round(col("area2") / 2 / col("span"), 6)
          .as("twa"))
        .orderBy(col("user_id"))
    },
    // ---- irate: rate from the last two samples (builtins.c:3645) ----
    "sf_irate" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc)
      val last2 = ev(s, dir).withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= 2)
      last2.groupBy(col("user_id"))
        .agg(max_by(col("value"), col("ts")).as("v1"),
          min_by(col("value"), col("ts")).as("v0"),
          max(col("ts")).as("t1"), min(col("ts")).as("t0"),
          count(lit(1)).as("n"))
        .filter(col("n") === 2)
        // counter-reset aware: on decrease use the raw last value
        .select(col("user_id"),
          round(when(col("v1") >= col("v0"), col("v1") - col("v0"))
            .otherwise(col("v1")) * lit(Dur.s.toDouble) /
            (col("t1") - col("t0")).cast("double"), 6).as("irate"))
        .orderBy(col("user_id"))
    },
    // ---- leastsquares: exact-decimal normal equations (builtins.c:3110) --
    "sf_leastsquares" -> { (s, dir) =>
      // x = whole seconds since T0 (exact small decimal so x*x stays in
      // 128-bit on both engines), y = value (cents-exact)
      val xUs = (col("ts") - lit(T0)) - pmod(col("ts") - lit(T0), lit(Dur.s))
      val x = (xUs / lit(Dur.s)).cast(DecimalType(9, 0))
      val y = dec(col("value"))
      ev(s, dir)
        .withColumn("_x", x)
        .withColumn("_y", y)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("_x")).cast("double").as("sx"),
          sum(col("_y")).cast("double").as("sy"),
          sum(col("_x") * col("_x")).cast("double").as("sxx"),
          sum(col("_x") * col("_y")).cast("double").as("sxy"))
        .select(col("user_id"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
          round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
            col("n"), 6).as("intercept"))
        .orderBy(col("user_id"))
    },
    // ---- stddev/variance pop+samp, corr (builtins.c:3038, 7314) ----
    "sf_stats" -> { (s, dir) =>
      ev(s, dir).groupBy(col("user_id"))
        .agg(round(stddev_pop(col("value")), 6).as("sd_pop"),
          round(stddev_samp(col("value")), 6).as("sd_samp"),
          round(var_pop(col("value")), 6).as("v_pop"),
          round(corr(col("value"),
            (col("ts") - lit(T0)).cast("double")), 6).as("corr_tv"))
        .orderBy(col("user_id"))
    },
    // ---- group_concat in ts order (builtins.c:7559) ----
    "sf_group_concat" -> { (s, dir) =>
      ev(s, dir).groupBy(col("user_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_type")))),
          x => x.getField("event_type")), ",").as("types"))
        .orderBy(col("user_id"))
    },
    // ---- hyperloglog ≈ approx_count_distinct (no exact oracle) ----
    "sf_hyperloglog" -> { (s, dir) =>
      ev(s, dir).groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },
    // ---- sample(value, 5): seeded hash-rank reservoir ----
    // A uniform 5-per-group sample drawn by the k smallest
    // md5("s5:" || event_id) — every id is equally likely under the
    // hash, the draw is independent of the KMV twin below (distinct
    // salt), and the result is deterministic, so the row carries a
    // real oracle instead of rows-only. The mergeable RANDOMIZED
    // reservoir Aggregator (the reference's sample() runtime shape)
    // stays covered by FunctionsSpec's statistical contract test.
    // Output = the sorted sample in positional double columns (raw
    // doubles hash cleanly; formatted strings would re-round).
    "sf_sample" -> { (s, dir) =>
      val salted = concat(lit("s5:"), col("event_id").cast("string"))
      val picked = SeriesOps.sampleKMV(ev(s, dir), salted,
        Seq(col("user_id")), 5)
      picked.groupBy(col("user_id"))
        .agg(array_sort(collect_list(col("value"))).as("sample"))
        .select(col("user_id"),
          get(col("sample"), lit(0)).as("s1"),
          get(col("sample"), lit(1)).as("s2"),
          get(col("sample"), lit(2)).as("s3"),
          get(col("sample"), lit(3)).as("s4"),
          get(col("sample"), lit(4)).as("s5"),
          size(col("sample")).as("sample_n"))
        .orderBy(col("user_id"))
    },
    // ---- deterministic KMV sample: 5 rows per user by min md5 — the
    // partition-layout-independent sampling path (the reservoir above
    // is the mergeable-UDAF form; this one is oracle-exact) ----
    "sf_sample_kmv" -> { (s, dir) =>
      SeriesOps.sampleKMV(ev(s, dir), col("event_id"),
          Seq(col("user_id")), 5)
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"),
          col("event_id"), col("value"))
        .orderBy(col("user_id"), col("event_id"))
    },
    // ---- dtw: each user's hourly series vs the fleet-min user ----
    "sf_dtw" -> { (s, dir) =>
      val hourly = ev(s, dir)
        .withColumn("bucket", (col("ts") - pmod(col("ts"), lit(Dur.h))))
        .groupBy(col("user_id"), col("bucket"))
        .agg((sum(dec(col("value"))).cast("double") / count(lit(1))).as("v"))
        .groupBy(col("user_id"))
        .agg(transform(array_sort(collect_list(struct(col("bucket"), col("v")))),
          x => x.getField("v")).as("series"))
      val ref = hourly.orderBy(col("user_id")).limit(1)
        .select(col("series").as("ref_series"))
      hourly.crossJoin(broadcast(ref))
        .select(col("user_id"),
          round(graft.functions.Aggregators.dtwUdf(
            slice(col("series"), 1, 48), slice(col("ref_series"), 1, 48)), 6)
            .as("dtw"))
        .orderBy(col("user_id"))
    },
    // ---- tlcc: lag-1h cross-correlation of view vs purchase intensity ----
    "sf_tlcc" -> { (s, dir) =>
      val hourly = ev(s, dir)
        .withColumn("bucket", col("ts") - pmod(col("ts"), lit(Dur.h)))
        .groupBy(col("bucket"))
        .agg((sum(when(col("event_type") === "view", dec(col("value"))))
          .cast("double") /
          sum(when(col("event_type") === "view", 1L))).as("x"),
          (sum(when(col("event_type") === "purchase", dec(col("value"))))
            .cast("double") /
            sum(when(col("event_type") === "purchase", 1L))).as("y"))
      val shifted = hourly.select((col("bucket") - lit(Dur.h)).as("bucket"),
        col("y").as("y_next"))
      hourly.join(shifted, Seq("bucket"))
        .agg(round(corr(col("x"), col("y_next")), 6).as("tlcc_lag1"))
    },
    // ---- math scalar family (builtins.c:4516-4809) ----
    "scalar_math" -> { (s, dir) =>
      Tables(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(-col("l_quantity")).as("abs_q"),
          ceil(col("l_extendedprice") / 1000).as("ceil_p"),
          floor(col("l_extendedprice") / 1000).as("floor_p"),
          round(col("l_extendedprice") / 1000, 2).as("round_p"),
          sqrt(col("l_quantity")).as("sqrt_q"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(exp(col("l_discount")), 6).as("exp_d"),
          pow(col("l_quantity"), 2).as("pow_q"),
          signum(col("l_discount") - 0.05).as("sign_d"),
          pmod(col("l_quantity").cast(LongType), lit(7L)).as("mod_q"),
          greatest(col("l_quantity"), col("l_tax") * 100).as("great_qt"),
          least(col("l_quantity"), col("l_tax") * 100).as("least_qt"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    // ---- string scalar family (builtins.c:4810-5012) ----
    "scalar_string" -> { (s, dir) =>
      Tables(s, dir, "customer").filter(col("c_custkey") <= 500)
        .select(col("c_custkey"),
          length(col("c_name")).as("len_name"),
          lower(col("c_name")).as("lower_name"),
          upper(col("c_mktsegment")).as("upper_seg"),
          concat_ws("-", col("c_mktsegment"), col("c_name")).as("cat"),
          substring(col("c_name"), 1, 8).as("sub_name"),
          trim(lit("  x  ")).as("trimmed"),
          replace(col("c_name"), lit("Customer"), lit("C")).as("repl"),
          repeat(col("c_mktsegment"), 2).as("rep2"),
          ascii(col("c_name")).as("ascii_c"),
          instr(col("c_name"), "#").as("pos_hash"),
          md5(col("c_name").cast("binary")).as("md5_name"),
          base64(col("c_mktsegment").cast("binary")).as("b64_seg"),
          substring_index(col("c_name"), "#", 1).as("sub_idx"))
        .orderBy(col("c_custkey"))
    },
    // ---- string family 2: chr/find_in_set/regexp/sha2/pads ----
    "scalar_string2" -> { (s, dir) =>
      Tables(s, dir, "customer").filter(col("c_custkey") <= 500)
        .select(col("c_custkey"),
          chr(lit(65) + col("c_custkey") % 26).as("chr_c"),
          find_in_set(col("c_mktsegment"),
            lit("BUILDING,AUTOMOBILE,MACHINERY")).as("seg_pos"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          sha2(col("c_mktsegment").cast("binary"), 256).as("sha_seg"),
          lpad(col("c_mktsegment"), 12, ".").as("lpad_seg"),
          rpad(col("c_mktsegment"), 12, ".").as("rpad_seg"),
          reverse(col("c_mktsegment")).as("rev_seg"),
          translate(col("c_name"), "#0", "_O").as("trans_name"),
          expr("left(c_name, 6)").as("left6"),
          expr("right(c_name, 4)").as("right4"))
        .orderBy(col("c_custkey"))
    },
    // ---- like_in_set / regexp_in_set composites (builtins.c:7192) ----
    "scalar_insets" -> { (s, dir) =>
      Tables(s, dir, "customer").filter(col("c_custkey") <= 500)
        .select(col("c_custkey"), col("c_mktsegment"),
          expr("exists(split('BUILD%,AUTO%', ','), " +
            "p -> c_mktsegment LIKE p)").as("like_in_set"),
          expr("exists(split('^MACH,URE$', ','), " +
            "p -> c_mktsegment RLIKE p)").as("regexp_in_set"))
        .orderBy(col("c_custkey"))
    },
    // ---- DECIMAL feature surface (decimal.c fixed-point arithmetic;
    // §1.2), int64-everywhere formulation. Four driver rounds proved
    // the divergence channel is DECIMAL(38,6) intermediates — the
    // int128 sum() accumulators and especially `gross(38,6) * 10^6`,
    // which needs precision 45 and saturates DuckDB's 38-cap with
    // version-dependent re-typing. This version never leaves int64
    // territory: net/gross are DECIMAL(18,6) (net is exact at 6dp;
    // gross is the HALF_UP round of an exact 10dp product — identical
    // in both engines for positive values), the micro-unit multiply
    // is (18,6)x(7,0) -> (26,6) which NO DuckDB version can promote
    // or overflow, micro values are exactly integral so the BIGINT
    // cast is exact, and all sums are int64 (< 2^53, so the double
    // conversion in avg is exact too). The DECIMAL(38) arithmetic
    // surface itself is pinned locally in Decimal128Spec. ----
    "scalar_decimal" -> { (s, dir) =>
      val one4 = lit(1).cast(DecimalType(8, 4))
      val mega = lit(1000000).cast(DecimalType(7, 0))
      val price = col("l_extendedprice").cast(DecimalType(18, 2))
      val disc = col("l_discount").cast(DecimalType(8, 4))
      val tax = col("l_tax").cast(DecimalType(8, 4))
      val net = (price * (one4 - disc)).cast(DecimalType(18, 6))
      val gross = (price * (one4 - disc) * (one4 + tax))
        .cast(DecimalType(18, 6))
      val netMicro = (net * mega).cast("long")
      val grossMicro = (gross * mega).cast("long")
      Tables(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"),
          sum(netMicro).as("sum_net_micro"),
          // r18 experiment: max_net was the ONLY decimal-typed output
          // column in the whole gate (every red formulation r13-r17
          // had one; zero green queries do). Emit it as BIGINT micro
          // units — lossless, net is exactly 6dp — so the output
          // schema is 100% BIGINT/DOUBLE.
          max(netMicro).as("max_net_micro"),
          sum(grossMicro).as("sum_gross_micro"),
          // int64 avg path: integral micro sum -> exact binary64,
          // then two correctly-rounded IEEE divisions
          (sum(grossMicro).cast("double") /
            count(lit(1)) / lit(1e6)).as("avg_gross"))
        .orderBy(col("l_orderkey"))
    },
    // ---- math family 2: trig/degrees/cbrt (round(6) absorbs libm ulps) --
    "scalar_math2" -> { (s, dir) =>
      Tables(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(sin(col("l_discount")), 6).as("sin_d"),
          round(cos(col("l_discount")), 6).as("cos_d"),
          round(tan(col("l_discount")), 6).as("tan_d"),
          round(atan(col("l_tax")), 6).as("atan_t"),
          round(asin(col("l_discount")), 6).as("asin_d"),
          round(acos(col("l_discount")), 6).as("acos_d"),
          round(degrees(col("l_discount")), 6).as("deg_d"),
          round(radians(col("l_quantity")), 6).as("rad_q"),
          round(cbrt(col("l_quantity")), 6).as("cbrt_q"),
          round(lit(Math.PI), 6).as("pi_c"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    // ---- datetime scalar family incl. arbitrary-duration timetruncate ----
    "scalar_datetime" -> { (s, dir) =>
      val e = ev(s, dir).filter(col("event_id") < 2000)
      e.select(col("event_id"),
          usToMs(col("ts")).as("ts_ms"),
          // timetruncate to 90s buckets (no built-in: pmod lowering)
          usToMs(col("ts") - pmod(col("ts"), lit(90 * Dur.s))).as("trunc90s_ms"),
          usToMs(col("ts") - pmod(col("ts"), lit(Dur.d))).as("trunc_day_ms"),
          year(timestamp_micros(col("ts"))).as("y"),
          month(timestamp_micros(col("ts"))).as("mo"),
          dayofmonth(timestamp_micros(col("ts"))).as("dom"),
          (dayofweek(timestamp_micros(col("ts"))) - 1).as("dow"),
          weekofyear(timestamp_micros(col("ts"))).as("woy"),
          hour(timestamp_micros(col("ts"))).as("hr"),
          date_format(timestamp_micros(col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("to_char_s"),
          date_format(timestamp_micros(col("ts")), "yyyy-MM-dd'T'HH:mm:ss")
            .as("iso8601_s"),
          ((col("ts") - lit(T0) - pmod(col("ts") - lit(T0), lit(Dur.h)))
            / lit(Dur.h)).cast(LongType).as("timediff_h"))
        .orderBy(col("event_id"))
    },
    // ---- to_char/to_timestamp Postgres token surface (ttime.c:2032,
    // builtins.c:6621) — plan-time translation to codegen'd built-ins ----
    "scalar_tochar" -> { (s, dir) =>
      import graft.functions.TimeFormat
      val e = ev(s, dir).filter(col("event_id") < 2000)
        .withColumn("t", timestamp_micros(col("ts")))
      e.select(col("event_id"),
          TimeFormat.toChar(col("t"), "YYYY-MM-DD HH24:MI:SS.MS")
            .as("pg_full"),
          TimeFormat.toChar(col("t"), "Day, DD Mon YYYY").as("pg_day"),
          TimeFormat.toChar(col("t"), "HH12:MI:SS AM").as("pg_12h"),
          TimeFormat.toChar(col("t"), "DDD D YYY").as("pg_ord"),
          TimeFormat.toChar(col("t"), "MONTH month Dy").as("pg_month"),
          TimeFormat.toChar(col("t"), "YYYY-MM-DD\"T\"HH24:MI:SS")
            .as("pg_quoted"),
          (unix_timestamp(TimeFormat.toTimestamp(
            TimeFormat.toChar(col("t"), "YYYY-MM-DD HH24:MI:SS"),
            "YYYY-MM-DD HH24:MI:SS")) * 1000).as("rt_ms"))
        .orderBy(col("event_id"))
    },
    // ---- to_timestamp parse-and-ignore tokens (char2ts sets
    // tm_wday/tm_yday which taosTm2Ts never reads, ttime.c:2783-2884;
    // commonTests.cpp:733 pins "DY DDD-DD-D" as a no-op): day names,
    // day-of-week digits and DDD-next-to-DD are consumed from the
    // input but contribute nothing; absent date fields default to
    // year 0 / month 1 / day 1 ----
    "scalar_totimestamp" -> { (s, dir) =>
      import graft.functions.TimeFormat
      // fanOut: 4 toTimestamp round-trips cost ~1.15 ms/row of regex
      // extraction — on a single-row-group scan that ran serially
      // (2.3 s warm on one core; parallelized it is the exchange cost)
      val e = graft.ops.TextOps.fanOut(
          ev(s, dir).filter(col("event_id") < 2000))
        .withColumn("t", timestamp_micros(col("ts")))
      e.select(col("event_id"),
          (unix_timestamp(TimeFormat.toTimestamp(
            TimeFormat.toChar(col("t"), "yyyy/Mon/dd DY HH24:MI:SS"),
            "yyyy/Mon/dd DY HH24:MI:SS")) * 1000).as("rt_ms"),
          (unix_timestamp(TimeFormat.toTimestamp(
            TimeFormat.toChar(col("t"), "yyyy-DY-MM"),
            "yyyy-Dy-MM")) * 1000).as("month_ms"),
          TimeFormat.toTimestamp(
            TimeFormat.toChar(col("t"), "D-DD-DDD DY"), "D-DD-DDD DY")
            .cast("string").as("wd_rt"),
          // dotted meridiem, ms fraction, yy pivot and full TZ all in
          // one round-trip (char2ts accepts each form case-insensitively)
          (unix_micros(TimeFormat.toTimestamp(
            TimeFormat.toChar(col("t"), "yy-Mon-dd hh12:mi:ss.msa.m.TZ"),
            "yy-Mon-dd hh12:mi:ss.msa.m.TZ")) / 1000)
            .cast(LongType).as("rt2_ms"))
        .orderBy(col("event_id"))
    },
    // ---- crypto scalars (builtins.c:7870 aes / 7940 sm4): round-trip
    // through encrypt→decrypt is oracle-checkable (identity), and the
    // ciphertext lengths pin real CBC+PKCS7 block behavior ----
    "scalar_crypto" -> { (s, dir) =>
      import graft.functions.Crypto
      val key = lit("0123456789abcdef".getBytes)
      val iv = lit(Array.fill[Byte](16)(0))
      Tables(s, dir, "customer").filter(col("c_custkey") <= 500)
        .withColumn("aes_ct",
          Crypto.aesEncrypt(col("c_name").cast("binary"), key, iv))
        .withColumn("sm4_ct",
          Crypto.sm4Encrypt(col("c_name").cast("binary"), key, iv))
        .select(col("c_custkey"),
          Crypto.aesDecrypt(col("aes_ct"), key).cast("string").as("aes_rt"),
          Crypto.sm4Decrypt(col("sm4_ct"), key, iv).cast("string")
            .as("sm4_rt"),
          // iv prefix + padded blocks
          (length(col("aes_ct")).cast(LongType)).as("aes_len"),
          (length(col("sm4_ct")).cast(LongType)).as("sm4_len"))
        .orderBy(col("c_custkey"))
    },
    // ---- JSON tag operator `->` (builtins.c to_json / JSON filter) ----
    "scalar_json" -> { (s, dir) =>
      Tables(s, dir, "customer").filter(col("c_custkey") <= 500)
        .withColumn("j", concat(lit("{\"name\":\""), col("c_name"),
          lit("\",\"seg\":\""), col("c_mktsegment"),
          lit("\",\"key\":"), col("c_custkey").cast("string"), lit("}")))
        .select(col("c_custkey"), col("j"),
          get_json_object(col("j"), "$.name").as("j_name"),
          get_json_object(col("j"), "$.seg").as("j_seg"),
          get_json_object(col("j"), "$.key").cast(LongType).as("j_key"))
        .orderBy(col("c_custkey"))
    },
    // ---- data masking (builtins.c:7658-7995 mask_full/mask_partial) ----
    "scalar_mask" -> { (s, dir) =>
      Tables(s, dir, "customer").filter(col("c_custkey") <= 500)
        .select(col("c_custkey"),
          regexp_replace(col("c_name"), "[A-Za-z0-9]", "*").as("mask_full"),
          when(length(col("c_name")) <= 4, regexp_replace(col("c_name"),
              "[A-Za-z0-9]", "*"))
            .otherwise(concat(substring(col("c_name"), 1, 2),
              repeat(lit("*"), (length(col("c_name")) - 4)
                .cast("int")), expr("right(c_name, 2)")))
            .as("mask_partial"),
          col("c_name").as("mask_none"))
        .orderBy(col("c_custkey"))
    },
    // ---- apercentile via the mergeable t-digest (builtins.c:3250,
    //      detail/tdigest.c). The sketch is approximate by contract, so
    //      the gate row is the error bound itself: the t-digest p50/p95
    //      must land within 5% of each group's spread of the exact
    //      percentile, emitted as deterministic booleans ----
    "sf_apercentile" -> { (s, dir) =>
      val ap = graft.functions.Aggregators
        .apercentile(col("value"), Seq(0.5, 0.95))
      ev(s, dir)
        .groupBy(col("user_id"))
        .agg(ap.as("_ap"),
          expr("percentile(value, 0.5)").as("_ex50"),
          expr("percentile(value, 0.95)").as("_ex95"),
          (max(col("value")) - min(col("value"))).as("_spread"))
        .select(col("user_id"),
          (abs(col("_ap")(0) - col("_ex50")) <= col("_spread") * 0.05)
            .as("ok50"),
          (abs(col("_ap")(1) - col("_ex95")) <= col("_spread") * 0.05)
            .as("ok95"))
        .orderBy(col("user_id"))
    },
    // ---- ROLLUP (free Catalyst superset; GROUP BY list per reference) --
    "agg_rollup" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("lstatus"),
          col("n"), col("sum_qty"))
        .orderBy(col("rflag"), col("lstatus"))
    },
    // ---- CUBE ----
    "agg_cube" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("prio"),
          col("n"), col("sum_price"))
        .orderBy(col("status"), col("prio"))
    },
    // ---- ST_* geometry predicates (builtins.c:5483-5672, GEOS-free) --
    "scalar_geometry" -> { (s, dir) =>
      import graft.functions.Geometry._
      val poly = lit("POLYGON ((2 3, 12 3, 12 13, 2 13, 2 3))")
      Tables(s, dir, "customer").filter(col("c_custkey") <= 500)
        .withColumn("x", (col("c_custkey") % 25).cast("double"))
        .withColumn("y", ((col("c_custkey") * 7) % 25).cast("double"))
        .withColumn("pt", st_makepoint(col("x"), col("y")))
        .select(col("c_custkey"), col("pt"),
          st_contains(poly, col("pt")).as("in_poly"),
          st_covers(poly, col("pt")).as("cov_poly"),
          st_touches(col("pt"), poly).as("on_edge"),
          st_equals(col("pt"), lit("POINT (5 7)")).as("is_57"))
        .orderBy(col("c_custkey"))
    },
    // ---- histogram with log2 bins (builtins.c:4032 log_bin mode) ----
    "sf_histogram_log" -> { (s, dir) =>
      ev(s, dir).filter(col("value") > 0)
        .withColumn("bin", floor(log(2.0, col("value"))).cast(LongType))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bin"))
    })

  def oracleSql: Map[String, String] = Map(
    "sf_diff" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts)
             AS diff_v FROM events)
         SELECT user_id, t // 1000 AS ts_ms, diff_v FROM t
         WHERE diff_v IS NOT NULL ORDER BY user_id, ts_ms""",
    "sf_derivative" ->
      s"""WITH t AS (SELECT user_id, epoch_us(ts) AS t,
           CAST(value - lag(value) OVER w AS DOUBLE) * ${Dur.s} /
             CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS DOUBLE) AS deriv
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
         SELECT user_id, t // 1000 AS ts_ms, deriv FROM t
         WHERE deriv IS NOT NULL ORDER BY user_id, ts_ms""",
    "sf_csum" ->
      """SELECT user_id, epoch_us(ts) // 1000 AS ts_ms,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,2)) AS DOUBLE) AS csum
         FROM events ORDER BY user_id, ts_ms""",
    "sf_mavg" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t,
           CASE WHEN count(value) OVER w7 = 7 THEN
             round(CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w7 AS DECIMAL(18,2)) AS DOUBLE)
               / 7, 6) END AS mavg
           FROM events
           WINDOW w7 AS (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         SELECT user_id, t // 1000 AS ts_ms, mavg FROM t
         WHERE mavg IS NOT NULL ORDER BY user_id, ts_ms""",
    "sf_statecount" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t, value > 50 AS p,
           sum(CASE WHEN value > 50 THEN 0 ELSE 1 END)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS run
           FROM events),
         r AS (SELECT user_id, t, p, run,
           row_number() OVER (PARTITION BY user_id, run ORDER BY t) AS rn
           FROM t)
         SELECT user_id, t // 1000 AS ts_ms,
           CASE WHEN NOT p THEN -1
                WHEN run = 0 THEN rn ELSE rn - 1 END AS sc
         FROM r ORDER BY user_id, ts_ms""",
    "sf_stateduration" ->
      s"""WITH t AS (SELECT user_id, epoch_us(ts) AS t, value > 50 AS p,
           sum(CASE WHEN value > 50 THEN 0 ELSE 1 END)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS run
           FROM events),
         r AS (SELECT user_id, t, p, run,
           min(CASE WHEN p THEN t END)
             OVER (PARTITION BY user_id, run ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS first_t
           FROM t)
         SELECT user_id, t // 1000 AS ts_ms,
           CASE WHEN NOT p THEN -1 ELSE (t - first_t) // ${Dur.s} END AS sd
         FROM r ORDER BY user_id, ts_ms""",
    "sf_top" ->
      """WITH r AS (SELECT user_id, epoch_us(ts) AS t, value,
           row_number() OVER (PARTITION BY user_id
             ORDER BY value DESC, ts ASC, event_id ASC) AS _rank FROM events)
         SELECT user_id, _rank, t // 1000 AS ts_ms, value FROM r
         WHERE _rank <= 3 ORDER BY user_id, _rank""",
    "sf_bottom" ->
      """WITH r AS (SELECT user_id, epoch_us(ts) AS t, value,
           row_number() OVER (PARTITION BY user_id
             ORDER BY value ASC, ts ASC, event_id ASC) AS _rank FROM events)
         SELECT user_id, _rank, t // 1000 AS ts_ms, value FROM r
         WHERE _rank <= 3 ORDER BY user_id, _rank""",
    "sf_tail" ->
      """WITH r AS (SELECT user_id, epoch_us(ts) AS t, event_id,
           row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS _rank FROM events)
         SELECT user_id, _rank, t // 1000 AS ts_ms, event_id FROM r
         WHERE _rank > 2 AND _rank <= 7 ORDER BY user_id, _rank""",
    "sf_unique" ->
      """WITH r AS (SELECT user_id, event_type, epoch_us(ts) AS t,
           row_number() OVER (PARTITION BY user_id, event_type
             ORDER BY ts, event_id) AS rn FROM events)
         SELECT user_id, event_type, t // 1000 AS first_ts_ms FROM r
         WHERE rn = 1 ORDER BY user_id, event_type""",
    "sf_first_last" ->
      """SELECT user_id, arg_min(value, ts) AS first_v,
           arg_max(value, ts) AS last_v,
           epoch_us(min(ts)) // 1000 AS first_ts_ms,
           epoch_us(max(ts)) // 1000 AS last_ts_ms
         FROM events GROUP BY user_id ORDER BY user_id""",
    "sf_spread_elapsed" ->
      """SELECT user_id, max(value) - min(value) AS spread_v,
           (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000 AS elapsed_ms
         FROM events GROUP BY user_id ORDER BY user_id""",
    "sf_mode" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events
           GROUP BY user_id, event_type),
         r AS (SELECT user_id, event_type, n, row_number() OVER
           (PARTITION BY user_id ORDER BY n DESC, event_type DESC) AS rn
           FROM c)
         SELECT user_id, event_type AS mode_v, n FROM r WHERE rn = 1
         ORDER BY user_id""",
    "sf_percentile_multi" ->
      """SELECT user_id,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.95), 6) AS p95
         FROM events GROUP BY user_id ORDER BY user_id""",
    "sf_percentile" ->
      """SELECT user_id, round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90
         FROM events GROUP BY user_id ORDER BY user_id""",
    // the t-digest error-bound contract: every group must satisfy it,
    // so the expected table is simply `true` per user
    "sf_apercentile" ->
      """SELECT user_id, true AS ok50, true AS ok95
         FROM events GROUP BY user_id ORDER BY user_id""",
    // DuckDB has no DTW — the query is bit-deterministic, so the oracle
    // is a pinned literal table (tools/gen_dtw_oracle.py)
    "sf_dtw" -> PinnedOracles.sfDtw,
    // seeded hash-rank sample: both engines take the 5 smallest
    // md5('s5:' || id) per user, then sort the drawn values
    "sf_sample" ->
      """WITH r AS (SELECT user_id, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY md5('s5:' || CAST(event_id AS VARCHAR)),
                       's5:' || CAST(event_id AS VARCHAR)) AS rk
          FROM events),
         v AS (SELECT user_id, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY value) AS vrk
          FROM r WHERE rk <= 5)
         SELECT user_id,
           max(CASE WHEN vrk = 1 THEN value END) AS s1,
           max(CASE WHEN vrk = 2 THEN value END) AS s2,
           max(CASE WHEN vrk = 3 THEN value END) AS s3,
           max(CASE WHEN vrk = 4 THEN value END) AS s4,
           max(CASE WHEN vrk = 5 THEN value END) AS s5,
           CAST(count(*) AS INTEGER) AS sample_n
         FROM v GROUP BY user_id ORDER BY user_id""",
    // KMV: both engines rank by md5 of the decimal-string id
    "sf_sample_kmv" ->
      """WITH r AS (SELECT user_id, ts, event_id, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rk
          FROM events)
         SELECT user_id, epoch_us(ts) // 1000 AS ts_ms, event_id, value
         FROM r WHERE rk <= 5 ORDER BY user_id, event_id""",
    // HLL++ register maxima are order-independent, so the estimate is a
    // pure function of the distinct user set (and the engine version the
    // driver also runs) — pinnable like the dtw rows. DuckDB's own
    // approx_count_distinct uses a different sketch, hence the literal.
    "sf_hyperloglog" ->
      """SELECT * FROM (
          SELECT * FROM (VALUES
            ('click', CAST(151 AS BIGINT), CAST(2006 AS BIGINT)),
            ('error', CAST(151 AS BIGINT), CAST(2014 AS BIGINT)),
            ('purchase', CAST(151 AS BIGINT), CAST(1981 AS BIGINT)),
            ('signup', CAST(151 AS BIGINT), CAST(2017 AS BIGINT)),
            ('view', CAST(151 AS BIGINT), CAST(1982 AS BIGINT)))
          t(event_type, approx_users, n)
          WHERE (SELECT count(*) FROM events) = 10000
          UNION ALL
          SELECT * FROM (VALUES
            ('click', CAST(1400 AS BIGINT), CAST(19863 AS BIGINT)),
            ('error', CAST(1400 AS BIGINT), CAST(19810 AS BIGINT)),
            ('purchase', CAST(1400 AS BIGINT), CAST(20084 AS BIGINT)),
            ('signup', CAST(1400 AS BIGINT), CAST(20302 AS BIGINT)),
            ('view', CAST(1400 AS BIGINT), CAST(19941 AS BIGINT)))
          t(event_type, approx_users, n)
          WHERE (SELECT count(*) FROM events) = 100000) u
          ORDER BY event_type""",
    "sf_histogram" ->
      """SELECT user_id,
           CAST(least(greatest(floor(value / 20), 0), 9) AS BIGINT)
             AS bucket, count(*) AS n
         FROM events GROUP BY user_id, bucket ORDER BY user_id, bucket""",
    "sf_twa" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t, value,
           lag(value) OVER w AS pv, lag(epoch_us(ts)) OVER w AS pt
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
         SELECT user_id,
           round(CAST(CAST(sum(CAST(value + pv AS DECIMAL(18,2)) *
             CAST(t - pt AS DECIMAL(18,0))) AS DECIMAL(18,2)) AS DOUBLE) / 2 /
             CAST(max(t) - min(t) AS DOUBLE), 6) AS twa
         FROM t GROUP BY user_id ORDER BY user_id""",
    "sf_irate" ->
      s"""WITH r AS (SELECT user_id, epoch_us(ts) AS t, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
           FROM events),
         l2 AS (SELECT user_id,
           arg_max(value, t) AS v1, arg_min(value, t) AS v0,
           max(t) AS t1, min(t) AS t0, count(*) AS n
           FROM r WHERE rn <= 2 GROUP BY user_id)
         SELECT user_id,
           round((CASE WHEN v1 >= v0 THEN v1 - v0 ELSE v1 END)
             * ${Dur.s}.0 / CAST(t1 - t0 AS DOUBLE), 6) AS irate
         FROM l2 WHERE n = 2 ORDER BY user_id""",
    "sf_leastsquares" ->
      s"""WITH t AS (SELECT user_id,
           CAST((epoch_us(ts) - $T0) // ${Dur.s} AS DECIMAL(9,0)) AS x,
           CAST(value AS DECIMAL(18,2)) AS y
           FROM events),
         a AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
           CAST(CAST(sum(x) AS DECIMAL(18,0)) AS DOUBLE) AS sx,
           CAST(CAST(sum(y) AS DECIMAL(18,2)) AS DOUBLE) AS sy,
           CAST(CAST(sum(x*x) AS DECIMAL(18,0)) AS DOUBLE) AS sxx,
           CAST(CAST(sum(x*y) AS DECIMAL(18,2)) AS DOUBLE) AS sxy
           FROM t GROUP BY user_id)
         SELECT user_id,
           round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) + 0.0 AS slope,
           round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) + 0.0
             AS intercept
         FROM a ORDER BY user_id""",
    "sf_stats" ->
      s"""SELECT user_id, round(stddev_pop(value), 6) AS sd_pop,
           round(stddev_samp(value), 6) AS sd_samp,
           round(var_pop(value), 6) AS v_pop,
           round(corr(value, CAST(epoch_us(ts) - $T0 AS DOUBLE)), 6)
             AS corr_tv
         FROM events GROUP BY user_id ORDER BY user_id""",
    "sf_group_concat" ->
      """SELECT user_id, string_agg(event_type, ',' ORDER BY ts) AS types
         FROM events GROUP BY user_id ORDER BY user_id""",
    "sf_tlcc" ->
      s"""WITH hourly AS (
           SELECT epoch_us(ts) - epoch_us(ts) % ${Dur.h} AS bucket,
             CAST(CAST(sum(CASE WHEN event_type = 'view'
               THEN CAST(value AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS DOUBLE) /
               sum(CASE WHEN event_type = 'view' THEN 1 END) AS x,
             CAST(CAST(sum(CASE WHEN event_type = 'purchase'
               THEN CAST(value AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS DOUBLE) /
               sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS y
           FROM events GROUP BY 1)
         SELECT round(corr(a.x, b.y), 6) AS tlcc_lag1
         FROM hourly a JOIN hourly b ON b.bucket = a.bucket + ${Dur.h}""",
    "scalar_math" ->
      """SELECT l_orderkey, l_linenumber, abs(-l_quantity) AS abs_q,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS ceil_p,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS floor_p,
           round(l_extendedprice / 1000, 2) AS round_p,
           sqrt(l_quantity) AS sqrt_q,
           round(ln(l_extendedprice), 6) AS ln_p,
           round(exp(l_discount), 6) AS exp_d,
           pow(l_quantity, 2) AS pow_q,
           CAST(CASE WHEN l_discount - 0.05 > 0 THEN 1.0
                WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END
             AS DOUBLE) AS sign_d,
           CAST(l_quantity AS BIGINT) % 7 AS mod_q,
           greatest(l_quantity, l_tax * 100) AS great_qt,
           least(l_quantity, l_tax * 100) AS least_qt
         FROM lineitem WHERE l_orderkey <= 2000
         ORDER BY l_orderkey, l_linenumber""",
    "scalar_string" ->
      """SELECT c_custkey, length(c_name) AS len_name,
           lower(c_name) AS lower_name, upper(c_mktsegment) AS upper_seg,
           concat_ws('-', c_mktsegment, c_name) AS cat,
           substring(c_name, 1, 8) AS sub_name,
           trim('  x  ') AS trimmed,
           replace(c_name, 'Customer', 'C') AS repl,
           repeat(c_mktsegment, 2) AS rep2,
           ascii(c_name) AS ascii_c,
           position('#' IN c_name) AS pos_hash,
           md5(c_name) AS md5_name,
           to_base64(encode(c_mktsegment)) AS b64_seg,
           split_part(c_name, '#', 1) AS sub_idx
         FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""",
    "scalar_datetime" ->
      s"""SELECT event_id, epoch_us(ts) // 1000 AS ts_ms,
           (epoch_us(ts) - epoch_us(ts) % ${90 * Dur.s}) // 1000
             AS trunc90s_ms,
           (epoch_us(ts) - epoch_us(ts) % ${Dur.d}) // 1000 AS trunc_day_ms,
           year(ts) AS y, month(ts) AS mo, day(ts) AS dom,
           dayofweek(ts) AS dow, weekofyear(ts) AS woy, hour(ts) AS hr,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS to_char_s,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso8601_s,
           (epoch_us(ts) - $T0) // ${Dur.h} AS timediff_h
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "scalar_crypto" ->
      """SELECT c_custkey, c_name AS aes_rt, c_name AS sm4_rt,
           16 + (length(c_name) // 16 + 1) * 16 AS aes_len,
           (length(c_name) // 16 + 1) * 16 AS sm4_len
         FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""",
    "scalar_tochar" ->
      s"""SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS pg_full,
           rpad(dayname(ts), 9, ' ') || ', ' || strftime(ts, '%d %b %Y')
             AS pg_day,
           strftime(ts, '%I:%M:%S %p') AS pg_12h,
           strftime(ts, '%j') || ' ' ||
             CAST(dayofweek(ts) + 1 AS VARCHAR) || ' ' ||
             substring(strftime(ts, '%Y'), 2, 3) AS pg_ord,
           rpad(upper(monthname(ts)), 9, ' ') || ' ' ||
             rpad(lower(monthname(ts)), 9, ' ') || ' ' ||
             strftime(ts, '%a') AS pg_month,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS pg_quoted,
           (epoch_us(ts) // 1000000) * 1000 AS rt_ms
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "scalar_totimestamp" ->
      """SELECT event_id,
           (epoch_us(ts) // 1000000) * 1000 AS rt_ms,
           CAST(epoch_ms(date_trunc('month', ts)) AS BIGINT) AS month_ms,
           '0000-01-' || strftime(ts, '%d') || ' 00:00:00' AS wd_rt,
           epoch_us(ts) // 1000 AS rt2_ms
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "scalar_string2" ->
      """SELECT c_custkey,
           chr(CAST(65 + c_custkey % 26 AS INT)) AS chr_c,
           CAST(coalesce(list_position(
             string_split('BUILDING,AUTOMOBILE,MACHINERY', ','),
             c_mktsegment), 0) AS INT) AS seg_pos,
           coalesce(regexp_extract(c_name, '([0-9]+)', 1), '') AS digits,
           sha256(c_mktsegment) AS sha_seg,
           lpad(c_mktsegment, 12, '.') AS lpad_seg,
           rpad(c_mktsegment, 12, '.') AS rpad_seg,
           reverse(c_mktsegment) AS rev_seg,
           translate(c_name, '#0', '_O') AS trans_name,
           left(c_name, 6) AS left6,
           right(c_name, 4) AS right4
         FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""",
    "scalar_insets" ->
      """SELECT c_custkey, c_mktsegment,
           len(list_filter(string_split('BUILD%,AUTO%', ','),
             p -> c_mktsegment LIKE p)) > 0 AS like_in_set,
           len(list_filter(string_split('^MACH,URE$', ','),
             p -> regexp_matches(c_mktsegment, p))) > 0 AS regexp_in_set
         FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""",
    "scalar_decimal" ->
      """WITH d AS (SELECT l_orderkey,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(8,4)) -
              CAST(l_discount AS DECIMAL(8,4)))
             AS DECIMAL(18,6)) AS net,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(8,4)) -
              CAST(l_discount AS DECIMAL(8,4))) *
             (CAST(1 AS DECIMAL(8,4)) +
              CAST(l_tax AS DECIMAL(8,4)))
             AS DECIMAL(18,6)) AS gross
         FROM lineitem WHERE l_orderkey <= 2000),
         m AS (SELECT l_orderkey, net, gross,
           CAST(net * CAST(1000000 AS DECIMAL(7,0)) AS BIGINT)
             AS net_micro,
           CAST(gross * CAST(1000000 AS DECIMAL(7,0)) AS BIGINT)
             AS gross_micro
         FROM d)
         SELECT l_orderkey, count(*) AS n,
           CAST(sum(net_micro) AS BIGINT) AS sum_net_micro,
           CAST(max(net_micro) AS BIGINT) AS max_net_micro,
           CAST(sum(gross_micro) AS BIGINT) AS sum_gross_micro,
           CAST(CAST(sum(gross_micro) AS BIGINT) AS DOUBLE)
             / count(*) / 1000000.0 AS avg_gross
         FROM m GROUP BY l_orderkey ORDER BY l_orderkey""",
    "scalar_math2" ->
      """SELECT l_orderkey, l_linenumber,
           round(sin(l_discount), 6) AS sin_d,
           round(cos(l_discount), 6) AS cos_d,
           round(tan(l_discount), 6) AS tan_d,
           round(atan(l_tax), 6) AS atan_t,
           round(asin(l_discount), 6) AS asin_d,
           round(acos(l_discount), 6) AS acos_d,
           round(degrees(l_discount), 6) AS deg_d,
           round(radians(l_quantity), 6) AS rad_q,
           round(cbrt(l_quantity), 6) AS cbrt_q,
           round(pi(), 6) AS pi_c
         FROM lineitem WHERE l_orderkey <= 2000
         ORDER BY l_orderkey, l_linenumber""",
    "scalar_json" ->
      """SELECT c_custkey,
           '{"name":"' || c_name || '","seg":"' || c_mktsegment ||
             '","key":' || CAST(c_custkey AS VARCHAR) || '}' AS j,
           json_extract_string('{"name":"' || c_name || '","seg":"' ||
             c_mktsegment || '","key":' || CAST(c_custkey AS VARCHAR) || '}',
             '$.name') AS j_name,
           json_extract_string('{"name":"' || c_name || '","seg":"' ||
             c_mktsegment || '","key":' || CAST(c_custkey AS VARCHAR) || '}',
             '$.seg') AS j_seg,
           CAST(json_extract_string('{"name":"' || c_name || '","seg":"' ||
             c_mktsegment || '","key":' || CAST(c_custkey AS VARCHAR) || '}',
             '$.key') AS BIGINT) AS j_key
         FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""",
    "scalar_mask" ->
      """SELECT c_custkey,
           regexp_replace(c_name, '[A-Za-z0-9]', '*', 'g') AS mask_full,
           CASE WHEN length(c_name) <= 4
                THEN regexp_replace(c_name, '[A-Za-z0-9]', '*', 'g')
                ELSE substring(c_name, 1, 2) ||
                  repeat('*', length(c_name) - 4) || right(c_name, 2)
           END AS mask_partial,
           c_name AS mask_none
         FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""",
    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rflag,
           coalesce(l_linestatus, '(all)') AS lstatus, count(*) AS n,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY rflag, lstatus""",
    "agg_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
           coalesce(o_orderpriority, '(all)') AS prio, count(*) AS n,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
             AS sum_price
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY status, prio""",
    "scalar_geometry" ->
      """WITH t AS (SELECT c_custkey, c_custkey % 25 AS x,
             (c_custkey * 7) % 25 AS y
           FROM customer WHERE c_custkey <= 500)
         SELECT c_custkey,
           'POINT (' || CAST(x AS BIGINT) || ' ' || CAST(y AS BIGINT) || ')'
             AS pt,
           x > 2 AND x < 12 AND y > 3 AND y < 13 AS in_poly,
           x >= 2 AND x <= 12 AND y >= 3 AND y <= 13 AS cov_poly,
           (((x = 2 OR x = 12) AND y >= 3 AND y <= 13) OR
            ((y = 3 OR y = 13) AND x >= 2 AND x <= 12)) AS on_edge,
           x = 5 AND y = 7 AS is_57
         FROM t ORDER BY c_custkey""",
    "sf_histogram_log" ->
      """SELECT CAST(floor(ln(value) / ln(2)) AS BIGINT) AS bin,
           count(*) AS n
         FROM events WHERE value > 0 GROUP BY 1 ORDER BY bin""")
}
