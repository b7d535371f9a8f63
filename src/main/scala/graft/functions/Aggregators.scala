package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom aggregate functions (SURVEY.md §2.10) that are not expressible
  * as compositions of Spark built-ins. Each is a distributive
  * `Aggregator[IN, BUF, OUT]` — the reference proves the same functions
  * distributive via their `_partial`/`_merge` pairs (builtins.c:3064+),
  * and the Aggregator buffer plays the role of `SUdfInterBuf`.
  *
  * Deliberately NOT here: twa / irate / elapsed-rate. Their partial states
  * are only mergeable across *ts-contiguous* block ranges (the reference
  * merges per-vnode blocks, which are ts-ordered); Spark partitions are
  * not ts-contiguous, so those lower to ordered window functions instead
  * (see Functions.sf_twa / sf_irate) — same math, correct distribution.
  */
object Aggregators {

  // ---------------------------------------------------------------------
  // sample(col, k): uniform reservoir sample (builtins.c:4400)
  // ---------------------------------------------------------------------

  /** Mergeable reservoir: classic algorithm-R per partition, weighted
    * merge across partitions. Deterministic given a partition layout
    * (seeded from the running count), uniform in distribution. */
  case class Reservoir(k: Int, seen: Long, items: Vector[Double]) {
    private def rng(seed: Long): Long = {
      var x = seed ^ 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    def add(v: Double): Reservoir =
      if (items.length < k) copy(seen = seen + 1, items = items :+ v)
      else {
        val j = math.floorMod(rng(seen ^ java.lang.Double.doubleToLongBits(v)),
          seen + 1).toInt
        if (j < k) copy(seen = seen + 1, items = items.updated(j, v))
        else copy(seen = seen + 1)
      }
    def merge(o: Reservoir): Reservoir =
      if (seen == 0) o else if (o.seen == 0) this
      else {
        // weighted interleave: pick from each side proportional to seen
        var left = this.items
        var right = o.items
        val total = seen + o.seen
        var out = Vector.empty[Double]
        var i = 0L
        while (out.length < k && (left.nonEmpty || right.nonEmpty)) {
          val pickLeft = right.isEmpty || (left.nonEmpty &&
            math.floorMod(rng(total + i), total) < seen)
          if (pickLeft) { out = out :+ left.head; left = left.tail }
          else { out = out :+ right.head; right = right.tail }
          i += 1
        }
        Reservoir(k, total, out)
      }
  }

  class SampleAgg(k: Int) extends Aggregator[Double, Reservoir, Seq[Double]] {
    def zero: Reservoir = Reservoir(k, 0L, Vector.empty)
    def reduce(b: Reservoir, v: Double): Reservoir = b.add(v)
    def merge(a: Reservoir, b: Reservoir): Reservoir = a.merge(b)
    def finish(r: Reservoir): Seq[Double] = r.items
    def bufferEncoder: Encoder[Reservoir] = Encoders.kryo[Reservoir]
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** sample(col, k) as an aggregate Column (grouped or global). */
  def sample(c: Column, k: Int): Column =
    udaf(new SampleAgg(k)).apply(c.cast("double"))

  // ---------------------------------------------------------------------
  // dtw / dtw_path / tlcc over collected series (builtins.c:7602-7657)
  // ---------------------------------------------------------------------

  /** Dynamic-time-warping distance between two series (DP, O(n*m), O(min)
    * memory). The reference likewise collects both series per group
    * before running the DP — bounded by the per-group series length,
    * which the caller controls. */
  def dtwDistance(a: Seq[Double], b: Seq[Double]): Double = {
    if (a.isEmpty || b.isEmpty) return Double.NaN
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = Array.fill(s.length + 1)(Double.PositiveInfinity)
    var cur = Array.fill(s.length + 1)(Double.PositiveInfinity)
    prev(0) = 0.0
    for (j <- 1 to t.length) {
      cur(0) = Double.PositiveInfinity
      for (i <- 1 to s.length) {
        val cost = math.abs(s(i - 1) - t(j - 1))
        cur(i) = cost + math.min(math.min(prev(i), cur(i - 1)), prev(i - 1))
      }
      val tmp = prev; prev = cur; cur = tmp
    }
    prev(s.length)
  }

  /** Warping path for [[dtwDistance]] (dtw_path, builtins.c:7602-7657):
    * the 0-based (i, j) alignment, start (0,0) to (n-1, m-1), computed
    * from the full DP matrix by backtracking (ties prefer the diagonal,
    * then the vertical step). O(n·m) memory — bounded by the per-group
    * series length the caller controls, same envelope as the reference. */
  def dtwPath(a: Seq[Double], b: Seq[Double]): Seq[(Int, Int)] = {
    if (a.isEmpty || b.isEmpty) return Seq.empty
    val n = a.length; val m = b.length
    val dp = Array.fill(n + 1, m + 1)(Double.PositiveInfinity)
    dp(0)(0) = 0.0
    for (i <- 1 to n; j <- 1 to m)
      dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(math.min(dp(i - 1)(j - 1), dp(i - 1)(j)), dp(i)(j - 1))
    var path = List.empty[(Int, Int)]
    var i = n; var j = m
    while (i > 0 && j > 0) {
      path = (i - 1, j - 1) :: path
      val diag = dp(i - 1)(j - 1); val up = dp(i - 1)(j); val lf = dp(i)(j - 1)
      if (diag <= up && diag <= lf) { i -= 1; j -= 1 }
      else if (up <= lf) i -= 1
      else j -= 1
    }
    path
  }

  /** Pearson correlation of two equal-length series at a given lag of
    * `b` relative to `a` (time-lagged cross-correlation core). */
  def tlccAt(a: Seq[Double], b: Seq[Double], lag: Int): Double = {
    val pairs =
      if (lag >= 0) a.drop(lag).zip(b.dropRight(math.min(lag, b.length)))
      else a.dropRight(-lag).zip(b.drop(-lag))
    if (pairs.length < 2) return Double.NaN
    val n = pairs.length.toDouble
    val mx = pairs.map(_._1).sum / n
    val my = pairs.map(_._2).sum / n
    var sxy = 0.0; var sxx = 0.0; var syy = 0.0
    pairs.foreach { case (x, y) =>
      sxy += (x - mx) * (y - my); sxx += (x - mx) * (x - mx)
      syy += (y - my) * (y - my)
    }
    if (sxx == 0 || syy == 0) Double.NaN else sxy / math.sqrt(sxx * syy)
  }

  val dtwUdf = udf(dtwDistance _)
  val dtwPathUdf = udf(dtwPath _)
  val tlccUdf = udf(tlccAt _)
}
