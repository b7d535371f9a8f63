package graft

import org.apache.spark.sql.execution.{FormattedMode, SimpleMode}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the 100 TB design goals (SURVEY §4 /
  * build-brief "optimize for scale"): filters and projections must
  * reach the parquet scan, small dimensions must broadcast, aggregates
  * must have a map-side partial phase, and the custom time-series
  * lowerings must not introduce extra shuffles. */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(SimpleMode)

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("filters and column pruning reach the parquet scan") {
    val p = plan("scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"),
      "filter not pushed to parquet")
    assert(!p.contains("l_comment"), "unused column not pruned from scan")
  }

  test("tag_scan reads only the tag columns from parquet") {
    val p = plan("tag_scan")
    assert(p.contains("ReadSchema"), p)
    // the scan must not materialize data columns — tags only
    assert(!p.contains("value") && !p.contains("event_id"),
      s"tag scan reads payload columns:\n$p")
  }

  test("dimension joins broadcast instead of shuffling") {
    val p = plan("join_inner")
    assert(countOf(p, "BroadcastHashJoin") >= 2,
      s"expected broadcast joins for customer/nation dims:\n$p")
    assert(!p.contains("SortMergeJoin"), "dim join fell back to SMJ")
  }

  test("aggregations run partial (map-side) before the exchange") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
    assert(countOf(p, "Exchange") == 2, // agg hash + final orderBy range
      s"unexpected shuffle count in q1_agg:\n$p")
  }

  test("interval window aggregation is a single data shuffle") {
    val p = plan("interval_partitioned")
    assert(countOf(p, "Exchange") == 2, // groupBy hash + final sort range
      s"interval window should shuffle once plus the output sort:\n$p")
    assert(p.contains("partial_count"), "window agg lost its partial phase")
  }

  test("asof join lowers to one union + one hash shuffle (no range join)") {
    val p = plan("asof_join_ge")
    assert(p.contains("Union"), "asof join should use the union lowering")
    assert(countOf(p, "Exchange") == 2, // window hash + final sort range
      s"asof join should cost exactly one data shuffle:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "asof join must not explode into a product join")
  }

  test("forward JLIMIT keeps the bounded index-carry shape") {
    val p = plan("asof_join_jlimit_fwd")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"forward JLIMIT must not explode into a product join:\n$p")
    // the rank expansion is a constant-size sequence, not collect_list
    assert(!p.contains("collect_list"),
      s"JLIMIT must not buffer per-row right histories:\n$p")
  }

  test("keyless window join is a bucketed equi-join, not a nested loop") {
    val p = plan("window_join_keyless")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"keyless range join must lower to a time-bucket equi-join:\n$p")
  }

  test("outer-join ON residuals keep the equi keys as join keys") {
    // the condition join must extract event_id for a hash/sort-merge
    // join — a residual that demotes the join to a nested loop would
    // be quadratic at scale
    for (q <- Seq("dialect_join_residual", "dialect_full_join_residual",
        "dialect_anti_residual")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"$q residual ON must not demote the equi join:\n$p")
    }
  }

  test("derived-table join keeps both aggregations partial") {
    val p = plan("dialect_subquery_join")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"subquery aggregates should map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ANN and fingerprint paths stay map-side native expressions") {
    // LSH: buckets from the native one-pass expression, queries
    // broadcast onto candidates — no sort-merge on the bucket join
    val lsh = plan("sim_lsh_ann")
    assert(lsh.contains("graft_lsh_buckets"),
      s"LSH buckets not the native expression:\n$lsh")
    assert(lsh.contains("BroadcastHashJoin"),
      s"LSH candidate join must broadcast the query side:\n$lsh")
    // MinHash: map-side native signatures, no product join anywhere
    val mh = plan("dedup_minhash_lsh")
    assert(mh.contains("graft_minhash_signature"),
      s"minhash signatures not the native expression:\n$mh")
    assert(!mh.contains("CartesianProduct"), mh)
    // SimHash: one pass, one exchange (the output sort) — the exploded
    // lowering's three aggregation shuffles are gone
    val sh = plan("dedup_simhash")
    assert(sh.contains("graft_simhash"),
      s"simhash not the native expression:\n$sh")
    assert(countOf(sh, "Exchange") <= 1,
      s"simhash should shuffle only for the output sort:\n$sh")
  }

  test("the 6-way TPC-H-shape join broadcasts every dimension") {
    val p = plan("tpch_q5")
    assert(countOf(p, "BroadcastHashJoin") >= 4,
      s"expected broadcast for customer/supplier/nation/region:\n$p")
    assert(p.contains("partial_sum"), "revenue agg lost its partial phase")
  }

  test("ts-ordered merge read sorts within partitions, no exchange") {
    val df = Tables(spark, sf, "events")
      .repartition(org.apache.spark.sql.functions.col("user_id"))
      .sortWithinPartitions("user_id", "ts")
    val p = df.queryExecution.explainString(SimpleMode)
    // one exchange for the repartition, none for the in-partition sort
    assert(countOf(p, "Exchange") == 1, s"merge-scan layout shuffled:\n$p")
    assert(p.contains("Sort") && p.contains("false, 0"),
      s"expected a non-global sort:\n$p")
  }

  test("events scan prunes to the referenced columns only") {
    val p = plan("interval_partitioned")
    // ts is bigint in the legacy ns layout, timestamp_ntz or timestamp
    // in the current timestamp[us] layout (depends on the reader's NTZ
    // inference conf) — either way only 3 columns read
    assert(
      "ReadSchema: struct<ts:(bigint|timestamp_ntz|timestamp),user_id:bigint,value:double>".r
        .findFirstIn(p).isDefined,
      s"events scan reads more than (ts,user_id,value):\n$p")
  }

  test("events ts-range filter is pushed to the parquet scan") {
    import org.apache.spark.sql.functions.col
    // mid-range bounds in the µs epoch domain (the default surface)
    val ev = Tables(spark, sf, "events")
    val Array(lo, hi) = ev.selectExpr("min(ts)", "max(ts)").collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val t0 = lo + (hi - lo) / 4
    val t1 = lo + (hi - lo) / 2
    val q = ev.filter(col("ts") >= t0 && col("ts") < t1)
    val p = q.queryExecution.explainString(FormattedMode)
    // TsRangePushdown must re-derive the range on the STORED column so
    // parquet prunes row groups — the 100 TB contract (SURVEY §2.1
    // row 1; reference scanoperator.c:2713 pushes the ts range the
    // same way). Legacy Long layout pushes natively; timestamp[us]
    // needs the derived predicate.
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts".r
        .findFirstIn(p).isDefined,
      s"events ts lower bound did not reach PushedFilters:\n$p")
    assert("PushedFilters: \\[[^\\]]*LessThanOrEqual\\(ts".r
        .findFirstIn(p).isDefined,
      s"events ts upper bound did not reach PushedFilters:\n$p")
    // and the rewrite must not change results
    val n = q.count()
    val expect = ev.collect().count { r =>
      val t = r.getAs[Long]("ts"); t >= t0 && t < t1 }
    assert(n == expect, s"pushdown rewrite changed row count: $n vs $expect")
  }

  test("contamination plan: broadcast candidate join, no nested loop") {
    import org.apache.spark.sql.functions.col
    val d = Tables(spark, sf, "documents")
    val q = graft.ops.DedupOps.contamination(
      d.filter(col("doc_id") % 7 =!= 0), "doc_id", "text",
      d.filter(col("doc_id") % 7 === 0), "doc_id", "text", 3, 0.8)
    val p = q.queryExecution.explainString(SimpleMode)
    // the prefix index and the eval sets broadcast; nothing may fall
    // back to a nested loop or a cartesian over the corpus
    assert(!p.contains("CartesianProduct"),
      s"contamination plan grew a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"contamination plan grew a nested loop:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast candidate/verify joins:\n$p")
  }

  test("DIV lower bound keeps trunc-toward-zero semantics at v <= 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    graft.plans.TsRangePushdown.install(spark)
    // DIV truncates toward zero: raw in [-(k-1), -1] satisfies
    // raw DIV k >= 0, so the derived raw-domain bound at v <= 0 must be
    // v*k - (k-1), not v*k — the rule matches bare `long DIV k` chains
    // session-wide, so pre-1970 rows must survive
    val df = Seq(-1500L, -999L, -1L, 0L, 1L, 999L, 1500L).toDF("raw")
    def got(pred: String) =
      df.filter(expr(pred)).collect().map(_.getLong(0)).sorted.toSeq
    assert(got("raw DIV 1000 >= 0") ==
      Seq(-999L, -1L, 0L, 1L, 999L, 1500L))
    assert(got("raw DIV 1000 >= -1") ==
      Seq(-1500L, -999L, -1L, 0L, 1L, 999L, 1500L))
    assert(got("raw DIV 1000 >= 1") == Seq(1500L))
    assert(got("raw DIV 1000 <= -1") == Seq(-1500L))
    assert(got("raw DIV 1000 <= 0") == Seq(-1500L, -999L, -1L, 0L, 1L, 999L))
  }

  test("ms and ns precision surfaces also push their ts ranges down") {
    import org.apache.spark.sql.functions.col
    // DIV-1000 (ms) and *1000 (ns) wrap the reinterpret — the rule
    // must invert through the rescale with conservative bounds
    for ((per, lo, hi) <- Seq(
        (1000L, 1704326400000L, 1704499200000L),
        (1000000000L, 1704326400000000000L, 1704499200000000000L))) {
      val ev = Tables.eventsAt(spark, sf, per)
      val q = ev.filter(col("ts") >= lo && col("ts") < hi)
      val p = q.queryExecution.explainString(FormattedMode)
      assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts".r
          .findFirstIn(p).isDefined,
        s"per=$per lower bound missing from PushedFilters:\n$p")
      val n = q.count()
      val expect = ev.collect().count { r =>
        val t = r.getAs[Long]("ts"); t >= lo && t < hi }
      assert(n == expect,
        s"per=$per pushdown changed row count: $n vs $expect")
    }
  }

  test("indef-fill occupied-bucket anti-join stays broadcast at small " +
      "windows x keys (hint is conditional, not unconditional)") {
    // the r18 plan hinted broadcast unconditionally; r19 makes it
    // conditional on windows x key-distinct <= 1M so a 100 TB key
    // space can never materialize the windowed output on the driver.
    // At test scale the bound is tiny -> the hint must still fire.
    val p = SparkEntry.queries("dialect_indef_interval_fill")(spark, sf)
      .queryExecution.explainString(SimpleMode)
    assert("BroadcastHashJoin \\[[^\\]]*\\], \\[[^\\]]*\\], LeftAnti".r
        .findFirstIn(p).isDefined,
      s"expected broadcast left-anti for the fill grid at small scale:\n$p")
    // the grid cross itself (local window spine x distinct keys) is a
    // broadcast nested-loop CROSS by design — only the anti-join shape
    // matters; it must never be the nested-loop fallback
    assert(!p.contains("BroadcastNestedLoopJoin BuildRight, LeftAnti") &&
      !p.contains("BroadcastNestedLoopJoin BuildLeft, LeftAnti"),
      "fill anti-join degenerated to a nested loop")
  }
}
