package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Aggregators
import graft.functions.Aggregators.TDigest

class TDigestSpec extends AnyFunSuite {
  import SparkTestSession._

  private def exactPercentile(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val idx = p * (s.length - 1)
    val lo = idx.toInt
    if (lo + 1 >= s.length) s.last
    else s(lo) + (idx - lo) * (s(lo + 1) - s(lo))
  }

  test("all-singleton digest reproduces the exact interpolated " +
      "percentile") {
    val xs = Seq(12.0, 3.5, 7.0, 99.0, 0.5, 42.0, 18.0)
    val d = xs.foldLeft(TDigest.empty(100.0))(_ add _)
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0))
      assert(math.abs(d.quantile(p) - exactPercentile(xs, p)) < 1e-12,
        s"p=$p")
  }

  test("compression bounds centroids and keeps quantile error small") {
    // skewed data: exp-ish tail over 50k points
    val xs = (0 until 50000).map(i => math.pow(1.0002, i) % 1000.0)
    val d = xs.foldLeft(TDigest.empty(100.0))(_ add _).compressed
    assert(d.centroids.length < 500,
      s"digest did not compress: ${d.centroids.length} centroids")
    val spread = xs.max - xs.min
    for (p <- Seq(0.01, 0.5, 0.95, 0.99)) {
      val err = math.abs(d.quantile(p) - exactPercentile(xs, p))
      assert(err <= 0.02 * spread, s"p=$p err=$err spread=$spread")
    }
  }

  test("merged partition digests agree with the single digest") {
    val xs = (0 until 20000).map(i => (i * 7919 % 20000).toDouble)
    val whole = xs.foldLeft(TDigest.empty(100.0))(_ add _)
    val merged = xs.grouped(3000)
      .map(_.foldLeft(TDigest.empty(100.0))(_ add _))
      .reduce(_ merge _)
    val spread = xs.max - xs.min
    for (p <- Seq(0.05, 0.5, 0.95)) {
      assert(math.abs(merged.quantile(p) - whole.quantile(p))
        <= 0.02 * spread, s"p=$p")
      assert(math.abs(merged.quantile(p) - exactPercentile(xs, p))
        <= 0.02 * spread, s"p=$p vs exact")
    }
  }

  test("apercentile aggregates per group through the udaf path") {
    import spark.implicits._
    val df = (0 until 2000).map(i => (i % 4, i.toDouble)).toDF("k", "v")
      .repartition(8)
    val out = Aggregators.apercentile(col("v"), Seq(0.5))
    val rows = df.groupBy(col("k")).agg(out.as("q")).orderBy(col("k"))
      .collect()
    rows.foreach { r =>
      val k = r.getInt(0)
      val exact = exactPercentile((0 until 2000)
        .filter(_ % 4 == k).map(_.toDouble), 0.5)
      assert(math.abs(r.getSeq[Double](1).head - exact) <= 40.0,
        s"k=$k") // 2% of the 0..1999 spread
    }
  }
}
