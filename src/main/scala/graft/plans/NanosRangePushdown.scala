package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: makes time-range predicates on a nanos→timestamp
  * converted column reach the parquet scan.
  *
  * The events table stores `ts` as long nanos (Spark 4 can't read
  * parquet TIMESTAMP(NANOS) natively; see graft.Tables), and queries
  * convert with `timestamp_micros(ts div 1000)`. By the time user
  * optimizer rules run, Catalyst has substituted the conversion into
  * the filter itself — `Filter(timestamp_micros(n div 1000) ≥ T, scan)`
  * — which the parquet source can't translate, so every range scan
  * degrades to a full scan. This rule conjoins an equivalent raw-nanos
  * bound for each such comparison:
  *
  *   conv ≥ T  ⟹  n ≥ T·1000 − 999       conv ≤ T  ⟹  n ≤ T·1000 + 999
  *   conv > T  ⟹  n ≥ T·1000 + 1         conv < T  ⟹  n ≤ T·1000 − 1
  *
  * (bounds are the superset-safe form valid for either floor or
  * truncating division, so negative-epoch inputs stay correct; the
  * original predicate remains as the exact residual). The raw bound is
  * a plain attribute comparison, which Catalyst pushes into the scan —
  * row-group stat skipping and partition pruning — restoring the
  * reference's pushdown behavior (oakstore/store.py:255-264) for
  * natural-form queries.
  *
  * Overflow discipline: a literal outside the nanos-representable
  * range (|T·1000| past Long.MaxValue — e.g. the common sentinel
  * timestamp'9999-12-31') must NOT be pushed: the wrapped product
  * would be conjoined as a WRONG bound and silently drop matching
  * rows. Such literals skip the rewrite (full scan + exact residual —
  * slower, never wrong). An equality rewrite emits its two bounds as
  * SEPARATE conjuncts: a single And would be re-split by the next
  * fixed-point pass, defeat the semanticEquals dedup, and keep the
  * plan changing until the optimizer's max-iteration guard fires.
  */
object NanosRangePushdown extends Rule[LogicalPlan] with PredicateHelper {

  /** timestamp_micros(n div 1000) over a long attribute → n. */
  private object Conv {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(IntegralDivide(attr: Attribute, Literal(1000L, LongType), _))
          if attr.dataType == LongType =>
        Some(attr)
      case _ => None
    }
  }

  /** T·1000 only when the product (and the ±999/±1 slack) stays inside
    * Long — the 1000-row slack bound keeps the guard simple and exact.
    */
  private def nanosOf(t: Long): Option[Long] =
    if (t >= (Long.MinValue + 1000L) / 1000L && t <= (Long.MaxValue - 1000L) / 1000L)
      Some(t * 1000L)
    else None

  private def ge(n: Attribute, v: Long) = GreaterThanOrEqual(n, Literal(v, LongType))
  private def le(n: Attribute, v: Long) = LessThanOrEqual(n, Literal(v, LongType))

  private def rawBounds(e: Expression): Seq[Expression] = e match {
    case GreaterThanOrEqual(Conv(n), Literal(t: Long, TimestampType)) =>
      nanosOf(t).map(v => ge(n, v - 999L)).toSeq
    case GreaterThan(Conv(n), Literal(t: Long, TimestampType)) =>
      nanosOf(t).map(v => ge(n, v + 1L)).toSeq
    case LessThanOrEqual(Conv(n), Literal(t: Long, TimestampType)) =>
      nanosOf(t).map(v => le(n, v + 999L)).toSeq
    case LessThan(Conv(n), Literal(t: Long, TimestampType)) =>
      nanosOf(t).map(v => le(n, v - 1L)).toSeq
    case EqualTo(Conv(n), Literal(t: Long, TimestampType)) =>
      nanosOf(t).toSeq.flatMap(v => Seq(ge(n, v - 999L), le(n, v + 999L)))
    // mirrored literal-first forms (T op conv ⟺ conv flipped-op T)
    case GreaterThanOrEqual(Literal(t: Long, TimestampType), Conv(n)) =>
      nanosOf(t).map(v => le(n, v + 999L)).toSeq
    case GreaterThan(Literal(t: Long, TimestampType), Conv(n)) =>
      nanosOf(t).map(v => le(n, v - 1L)).toSeq
    case LessThanOrEqual(Literal(t: Long, TimestampType), Conv(n)) =>
      nanosOf(t).map(v => ge(n, v - 999L)).toSeq
    case LessThan(Literal(t: Long, TimestampType), Conv(n)) =>
      nanosOf(t).map(v => ge(n, v + 1L)).toSeq
    case EqualTo(Literal(t: Long, TimestampType), Conv(n)) =>
      nanosOf(t).toSeq.flatMap(v => Seq(ge(n, v - 999L), le(n, v + 999L)))
    case _ => Seq.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = splitConjunctivePredicates(cond)
      val extra = existing
        .flatMap(rawBounds)
        .filterNot(rb => existing.exists(_.semanticEquals(rb)))
        .distinct
      if (extra.isEmpty) f
      else Filter((existing ++ extra).reduce(And), child)
  }
}
