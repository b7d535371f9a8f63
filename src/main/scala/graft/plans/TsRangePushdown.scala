package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Re-derives storage-domain time-range predicates from epoch-Long
  * comparisons so the parquet scan can prune row groups / partitions.
  *
  * The engine's query surface exposes `ts` as an epoch Long
  * (ms/µs/ns per table precision — reference `scanoperator.c:2713`
  * pushes the ts range into the scan the same way), but the driver's
  * current `events` layout stores a parquet `timestamp[us]` column.
  * [[graft.Tables.eventsAt]] normalizes with a projection
  * `ts := unix_micros(cast(ts as timestamp))` — after Catalyst pushes a
  * query's `ts >= T0` below that projection, the comparison sits on a
  * *derived* expression, which the parquet source cannot translate into
  * a data filter: at 100 TB every events query becomes a full scan.
  *
  * This rule walks each [[Filter]] conjunct of the shape
  * `chain(rawCol) ⋈ longLiteral` where `chain` is a monotone
  * normalization chain — `unix_micros(cast(ntz as timestamp))` under an
  * optional `DIV k` / `* k` rescale (exactly the chains `eventsAt`
  * emits for ms/µs/ns), or a bare `rawLong DIV k` (legacy ns-Long
  * layout) — and ANDs in the *implied* comparison on the raw column in
  * its stored type. The original conjunct is kept, so the added
  * predicate only ever widens (conservative bounds under integer
  * division), never changes semantics; the new attribute-vs-literal
  * conjunct is exactly what `ParquetFilters` can push
  * (`PushedFilters: [GreaterThanOrEqual(ts, …)]` — asserted in
  * `PlanSpec`). Idempotent, so safe under the optimizer's fix-point
  * "User Provided Optimizers" batch.
  *
  * The NTZ→LTZ cast is only invertible under a fixed-offset zone; the
  * rewrite therefore requires the cast's resolved zone to be UTC (all
  * graft sessions pin UTC at build time).
  */
object TsRangePushdown extends Rule[LogicalPlan] {

  /** Raw column plus conservative bound translators: `lower(v)` gives a
    * raw-domain `b` with `(derived >= v) ⇒ (raw >= b)`; `upper(v)` a
    * `b` with `(derived <= v) ⇒ (raw <= b)`. Raw domain = the
    * attribute's internal Long (micros for TIMESTAMP_NTZ storage). */
  private case class Chain(attr: AttributeReference,
      lower: Long => Option[Long], upper: Long => Option[Long])

  private val utcZones = Set("UTC", "Etc/UTC", "GMT", "Z", "+00:00")

  private def mulExact(a: Long, b: Long): Option[Long] =
    try Some(Math.multiplyExact(a, b)) catch {
      case _: ArithmeticException => None }

  private def addExact(a: Long, b: Long): Option[Long] =
    try Some(Math.addExact(a, b)) catch {
      case _: ArithmeticException => None }

  private def decompose(e: Expression): Option[Chain] = e match {
    // the loader's zero-cost reinterpret: derived Long == internal µs
    case graft.functions.TimestampNtzMicros(a: AttributeReference) =>
      Some(Chain(a, v => Some(v), v => Some(v)))
    case UnixMicros(c: Cast)
        if c.dataType == TimestampType &&
          c.child.isInstanceOf[AttributeReference] &&
          c.child.dataType == TimestampNTZType &&
          c.timeZoneId.exists(utcZones.contains) =>
      val a = c.child.asInstanceOf[AttributeReference]
      Some(Chain(a, v => Some(v), v => Some(v)))
    case a: AttributeReference if a.dataType == LongType =>
      Some(Chain(a, v => Some(v), v => Some(v)))
    // derived = inner * k (µs → ns surface): ⌊v/k⌋ bounds are implied
    // in both directions for any sign (floorDiv pairs with the widened
    // >= / <= forms the caller emits)
    case m: Multiply =>
      (m.left, m.right) match {
        case (inner, Literal(k: Long, LongType)) if k > 0 =>
          decompose(inner).map(ch => Chain(ch.attr,
            v => ch.lower(Math.floorDiv(v, k)),
            v => ch.upper(Math.floorDiv(v, k))))
        case (Literal(k: Long, LongType), inner) if k > 0 =>
          decompose(inner).map(ch => Chain(ch.attr,
            v => ch.lower(Math.floorDiv(v, k)),
            v => ch.upper(Math.floorDiv(v, k))))
        case _ => None
      }
    // derived = inner DIV k (µs → ms surface). Spark's DIV truncates
    // TOWARD ZERO, not floor: for v >= 1 a negative raw can never reach
    // the bound, so raw >= v*k is implied; but for v <= 0 the set
    // { raw : trunc(raw/k) >= v } extends down to v*k - (k-1)
    // (e.g. raw in [-(k-1), -1] satisfies raw DIV k >= 0), so the
    // implied lower bound there is v*k - (k-1) — emitting v*k would
    // wrongly drop pre-1970 rows.
    case d: IntegralDivide =>
      (d.left, d.right) match {
        case (inner, Literal(k: Long, LongType)) if k > 0 =>
          decompose(inner).map(ch => Chain(ch.attr,
            v => mulExact(v, k)
              .flatMap(b => if (v >= 1) Some(b) else addExact(b, 1 - k))
              .flatMap(ch.lower),
            v => addExact(v, 1).flatMap(mulExact(_, k)).map(_ - 1)
              .flatMap(ch.upper)))
        case _ => None
      }
    case _ => None
  }

  /** Only chains rooted in a normalization wrapper are interesting —
    * a bare `long_col >= 5` would just re-derive itself. */
  private def nonTrivial(e: Expression): Boolean = e match {
    case _: UnixMicros | _: Multiply | _: IntegralDivide => true
    case _: graft.functions.TimestampNtzMicros => true
    case _ => false
  }

  private def rawLit(attr: AttributeReference, v: Long): Literal =
    if (attr.dataType == TimestampNTZType) Literal(v, TimestampNTZType)
    else Literal(v)

  private def lowerPred(e: Expression, v: Long): Option[Expression] =
    if (!nonTrivial(e)) None
    else decompose(e).flatMap(ch => ch.lower(v).map(b =>
      GreaterThanOrEqual(ch.attr, rawLit(ch.attr, b))))

  private def upperPred(e: Expression, v: Long): Option[Expression] =
    if (!nonTrivial(e)) None
    else decompose(e).flatMap(ch => ch.upper(v).map(b =>
      LessThanOrEqual(ch.attr, rawLit(ch.attr, b))))

  /** The raw-domain predicate implied by one epoch-domain conjunct.
    * `>` / `<` widen to the inclusive form — implied, and parquet
    * row-group min/max pruning is inclusive anyway. */
  private def derive(p: Expression): Seq[Expression] = p match {
    case GreaterThanOrEqual(d, Literal(v: Long, LongType)) =>
      lowerPred(d, v).toSeq
    case GreaterThan(d, Literal(v: Long, LongType)) =>
      lowerPred(d, v).toSeq
    case LessThanOrEqual(d, Literal(v: Long, LongType)) =>
      upperPred(d, v).toSeq
    case LessThan(d, Literal(v: Long, LongType)) =>
      upperPred(d, v).toSeq
    case EqualTo(d, Literal(v: Long, LongType)) =>
      lowerPred(d, v).toSeq ++ upperPred(d, v).toSeq
    // mirrored literal-first spellings
    case GreaterThanOrEqual(Literal(v: Long, LongType), d) =>
      upperPred(d, v).toSeq
    case GreaterThan(Literal(v: Long, LongType), d) =>
      upperPred(d, v).toSeq
    case LessThanOrEqual(Literal(v: Long, LongType), d) =>
      lowerPred(d, v).toSeq
    case LessThan(Literal(v: Long, LongType), d) =>
      lowerPred(d, v).toSeq
    case EqualTo(Literal(v: Long, LongType), d) =>
      lowerPred(d, v).toSeq ++ upperPred(d, v).toSeq
    case _ => Nil
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case f @ Filter(cond, child) =>
        val conj = splitConj(cond)
        val extra = conj.flatMap(derive)
          .filterNot(p => conj.exists(_.semanticEquals(p)))
          .foldLeft(Seq.empty[Expression]) { (acc, p) =>
            if (acc.exists(_.semanticEquals(p))) acc else acc :+ p }
        if (extra.isEmpty) f
        else Filter((conj ++ extra).reduce(And), child)
    }

  /** Idempotently registers the rule on a session's optimizer. Called
    * once per session at bootstrap (Verify / Bench / test harness). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
