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
  // apercentile(col, p, "t-digest") (builtins.c:3250, the reference's
  // mergeable sketch in function/src/detail/tdigest.c)
  // ---------------------------------------------------------------------

  /** Mergeable t-digest (the merging variant): centroid widths are
    * bounded by the k1 scale k(q) = δ/2π·asin(2q−1), which keeps tail
    * centroids near-singleton (sharp p95/p99) while mid-range centroids
    * absorb ~δ-th fractions of the mass. New values buffer and fold in
    * at `bufferCap` boundaries; partition sketches merge by centroid
    * concatenation + one compression pass — the same partial/merge
    * split the reference uses for its per-vnode digests. */
  case class TDigest(compression: Double,
      centroids: Vector[(Double, Long)], buffer: Vector[Double]) {

    def add(v: Double): TDigest = {
      val b = buffer :+ v
      if (b.length >= TDigest.bufferCap)
        copy(buffer = b).compressed
      else copy(buffer = b)
    }

    def merge(o: TDigest): TDigest =
      TDigest(compression, centroids ++ o.centroids,
        buffer ++ o.buffer).compressed

    private def kScale(q: Double): Double =
      compression / (2 * math.Pi) *
        math.asin(2 * math.min(math.max(q, 0.0), 1.0) - 1)

    private def kInverse(k: Double): Double = {
      val s = math.sin(k * 2 * math.Pi / compression)
      (s + 1) / 2
    }

    /** Fold the buffer into the centroid list, greedily merging
      * adjacent (mean-sorted) clusters while the k-width stays <= 1. */
    def compressed: TDigest = {
      val pts = (centroids ++ buffer.map((_, 1L))).sortBy(_._1)
      if (pts.isEmpty) return copy(buffer = Vector.empty)
      val total = pts.iterator.map(_._2).sum.toDouble
      val out = Vector.newBuilder[(Double, Long)]
      var (cm, cw) = pts.head
      var wBefore = 0L
      var limit = total * kInverse(kScale(0.0) + 1.0)
      pts.tail.foreach { case (m, w) =>
        if (wBefore + cw + w <= limit) {
          // weighted running mean keeps the merge order-independent
          // enough for an approx sketch (exactness is the oracle bound)
          cm = cm + (m - cm) * w / (cw + w)
          cw += w
        } else {
          out += ((cm, cw))
          wBefore += cw
          limit = total * kInverse(kScale(wBefore / total) + 1.0)
          cm = m; cw = w
        }
      }
      out += ((cm, cw))
      TDigest(compression, out.result(), Vector.empty)
    }

    /** Quantile by interpolating between centroid midpoints (each
      * centroid's mass is centred on its mean). The target rank uses
      * the order-statistic convention `0.5 + p·(n−1)` so the all-
      * singleton digest reproduces the exact interpolated percentile
      * (rank p·(n−1) over sorted values) bit-for-bit. */
    def quantile(p: Double): Double = {
      val d = compressed
      val cs = d.centroids
      if (cs.isEmpty) return Double.NaN
      if (cs.length == 1) return cs.head._1
      val total = cs.iterator.map(_._2).sum.toDouble
      val target = 0.5 + p * (total - 1)
      var cum = 0.0
      var prevMid = 0.0
      var prevMean = cs.head._1
      var i = 0
      while (i < cs.length) {
        val (m, w) = cs(i)
        val mid = cum + w / 2.0
        if (target <= mid) {
          if (i == 0) return m
          val f = (target - prevMid) / (mid - prevMid)
          return prevMean + f * (m - prevMean)
        }
        cum += w; prevMid = mid; prevMean = m; i += 1
      }
      cs.last._1
    }
  }

  object TDigest {
    val bufferCap = 512
    def empty(compression: Double): TDigest =
      TDigest(compression, Vector.empty, Vector.empty)
  }

  class TDigestAgg(probs: Seq[Double], compression: Double)
      extends Aggregator[Double, TDigest, Seq[Double]] {
    def zero: TDigest = TDigest.empty(compression)
    def reduce(b: TDigest, v: Double): TDigest = b.add(v)
    def merge(a: TDigest, b: TDigest): TDigest = a.merge(b)
    def finish(d: TDigest): Seq[Double] = {
      val c = d.compressed
      probs.map(c.quantile)
    }
    def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** apercentile(col, probs) via the mergeable t-digest sketch. Default
    * compression matches the reference's pinned COMPRESSION 300
    * (include/util/tdigest.h:35), so tail quantiles carry the same
    * accuracy contract as the engine being matched. */
  def apercentile(c: Column, probs: Seq[Double],
      compression: Double = 300.0): Column =
    udaf(new TDigestAgg(probs, compression)).apply(c.cast("double"))

  /** SQL-registrable apercentile(value, p) with TDengine's 0-100 `p`
    * as a runtime argument (builtins.c:3250) — the registered-name
    * form the dialect resolves; [[apercentile]] is the Column form. */
  class TDigestPAgg
      extends Aggregator[(Double, Double), (TDigest, Double), Double] {
    def zero: (TDigest, Double) = (TDigest.empty(300.0), Double.NaN)
    def reduce(b: (TDigest, Double), in: (Double, Double)) =
      (b._1.add(in._1), in._2)
    def merge(a: (TDigest, Double), b: (TDigest, Double)) =
      (a._1.merge(b._1), if (a._2.isNaN) b._2 else a._2)
    def finish(r: (TDigest, Double)): Double =
      if (r._2.isNaN) Double.NaN
      else r._1.compressed.quantile(r._2 / 100.0)
    def bufferEncoder: Encoder[(TDigest, Double)] =
      Encoders.kryo[(TDigest, Double)]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

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
