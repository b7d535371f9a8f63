package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.SimpleMode
import org.scalatest.funsuite.AnyFunSuite

/** Golden plan-shape corpus: freezes the *operator histogram* of the
  * physical plan for the signature queries, so pushdown / broadcast /
  * shuffle-count guarantees can't erode silently (the reference's own
  * layer-2 tests snapshot plans the same way —
  * `test/cases/14-JoinQueries/ans` .ans files). PlanSpec asserts point
  * predicates ("this join broadcasts"); this spec pins the whole
  * shape: any new Exchange, a broadcast falling back to SortMergeJoin,
  * a CartesianProduct sneaking in, or a lost partial-agg phase shows
  * up as a one-line diff.
  *
  * Only load-bearing operators are counted (exchanges, joins,
  * aggregates, sorts, unions, expands, generates, window exec, scans)
  * — Project/Filter churn from trivial refactors doesn't invalidate
  * the corpus.
  *
  * To regenerate after an INTENTIONAL plan change:
  *   GRAFT_REGEN_PLAN_GOLDEN=1 sbt "testOnly graft.PlanGoldenSpec"
  * then review the diff of src/test/resources/plan_golden.txt like any
  * other code change.
  */
class PlanGoldenSpec extends AnyFunSuite {
  import SparkTestSession._

  private val goldenPath = "src/test/resources/plan_golden.txt"

  /** The signature queries: one per load-bearing plan family. All are
    * declarative (single lazy DataFrame) — eager multi-job gates
    * (GlobalScan keyless ops, stream replays) end in a Scan ExistingRDD
    * whose interesting work happened before the final plan, so pinning
    * them here would freeze nothing. */
  private val signatureQueries = Seq(
    "q1_agg",              // partial/final agg split
    "tpch_q3",             // multi-join + agg + topN
    "tpch_q5",             // 6-way broadcast star join
    "scan_filter_project", // pushdown + pruning
    "join_inner",          // dimension broadcast joins
    "join_multiway",       // multiway broadcast
    "interval_partitioned",// keyed time window agg
    "interval_sliding",    // hopping window explode (Generate fan-out)
    "asof_join_ge",        // asof = union lowering, no range join
    "asof_join_jlimit",    // bounded index-carry
    "window_join",         // WINDOW_OFFSET join
    "window_join_keyless", // bucketed equi-key, not BNLJ
    "session_window",      // gap sessionize
    "state_window",        // run-length windows
    "fill_linear",         // gap fill
    "interp_linear",       // interpolation
    "dedup_simhash",       // one-pass native expression
    "sim_topk",            // broadcast-query ANN
    "slimit_per_group",    // per-group limit
    "window_over",         // OVER window functions
    "text_repetition",     // positional-stream lead() gram counting
    "pack_sequences",      // secondary-sort streaming pack
    "mix_exact",           // broadcast-k rank draw
    "vocab_topk",          // partial-agg'd global top-k
    "text_pii_redact",     // shuffle-free scrub (1 exchange = ORDER BY)
    // dedup plan families (r13 verdict: these regressed via plan
    // erosion — lost persists, projection collapse — caught only by
    // bench timing; pin their shapes so the spec fails first)
    "dedup_ngram_jaccard", // PPJoin prefix filter + verify
    "dedup_minhash_lsh",   // banded buckets + broadcast id prune
    "dedup_winnowing",     // codegen window-min fingerprints (the 87s
                           // projection-collapse class)
    "dedup_contamination", // eval-side prefix fence, broadcast guard
    "dedup_semantic",      // codebook probe + persisted fan-out
    // chainedJoinSql delegation (r15 moved it to a regex FROM-rewrite;
    // pin both routes so a rewrite slip shows as a plan diff, not a
    // silent wrong-join)
    "dialect_chain_join",  // explicit 3-table JOIN … ON chain
    "dialect_comma_join3") // 3-table comma-list fallback

  /** explain line → operator token, or None if not load-bearing.
    * Lines look like `   :- *(3) HashAggregate(keys=[...` — strip tree
    * glyphs and the codegen `*(n)` marker, then classify on the first
    * word so column names can never false-match. */
  private def opToken(line0: String): Option[String] = {
    val line = line0.dropWhile(c => " :+-*".contains(c))
      .replaceAll("^\\(\\d+\\)\\s*", "")
    val word = line.takeWhile(_.isLetter)
    word match {
      case "Exchange" =>
        if (line.contains("rangepartitioning")) Some("ExchangeRange")
        else if (line.contains("SinglePartition")) Some("ExchangeSingle")
        else Some("ExchangeHash")
      case "BroadcastExchange" => Some("BroadcastExchange")
      case "BroadcastHashJoin" | "SortMergeJoin" | "ShuffledHashJoin" |
           "BroadcastNestedLoopJoin" | "CartesianProduct" => Some(word)
      case "HashAggregate" | "ObjectHashAggregate" | "SortAggregate" =>
        // keep the partial/final distinction: losing the map-side
        // phase halves to the same node count otherwise
        if (line.contains("functions=[partial_")) Some(word + "Partial")
        else Some(word)
      case "Sort" => Some("Sort")
      case "Union" => Some("Union")
      case "Expand" | "Generate" | "Window" | "WindowGroupLimit" =>
        Some(word)
      case "FileScan" => Some("FileScan")
      case "InMemoryTableScan" => Some("InMemoryTableScan")
      case "Scan" => Some("ScanRDD")
      case _ => None
    }
  }

  private def signature(name: String): String = {
    val p = SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(SimpleMode)
    val ops = p.linesIterator.flatMap(opToken).toSeq
    // interpreted higher-order lambdas are the hot-path poison the
    // r12/r13 regressions traced to (a codegen'd native Expression
    // silently replaced by transform()/aggregate() re-evaluation):
    // pin their count so a swap shows up as a diff, and a cache miss
    // (lost persist) shows as an InMemoryTableScan count drop
    val hofs = "lambdafunction\\(".r.findAllIn(p).size
    (ops.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (op, xs) => s"$op=${xs.size}" } ++
      (if (hofs > 0) Seq(s"LambdaHOF=$hofs") else Nil)).mkString(",")
  }

  test("physical plan shapes match the golden corpus") {
    // other suites sharing this session may have left frames cached;
    // CacheManager substitutes InMemoryTableScan for matching plan
    // fragments, which would make the signatures order-dependent.
    // Clear first: each query's OWN persist() calls re-mark during
    // construction, so intra-query cache reads still count.
    spark.catalog.clearCache()
    val actual = signatureQueries.map(n => n -> signature(n))
    if (sys.env.get("GRAFT_REGEN_PLAN_GOLDEN").contains("1")) {
      Files.write(Paths.get(goldenPath),
        actual.map { case (n, s) => s"$n|$s" }.mkString("", "\n", "\n")
          .getBytes(StandardCharsets.UTF_8))
      info(s"regenerated $goldenPath")
    } else {
      val golden = new String(
        Files.readAllBytes(Paths.get(goldenPath)), StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty)
        .map { l => val Array(n, s) = l.split("\\|", 2); n -> s }.toMap
      val diffs = actual.flatMap { case (n, s) =>
        golden.get(n) match {
          case Some(g) if g == s => None
          case Some(g) => Some(s"$n:\n  golden: $g\n  actual: $s")
          case None => Some(s"$n: not in golden file\n  actual: $s")
        }
      }
      assert(diffs.isEmpty,
        "plan shapes drifted from the golden corpus (regenerate with " +
          "GRAFT_REGEN_PLAN_GOLDEN=1 only if the change is intended):\n" +
          diffs.mkString("\n"))
      assert(golden.keySet == signatureQueries.toSet,
        "golden file has stale entries: " +
          (golden.keySet -- signatureQueries).mkString(","))
    }
  }
}
