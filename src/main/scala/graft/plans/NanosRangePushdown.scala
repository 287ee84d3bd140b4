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
  */
object NanosRangePushdown extends Rule[LogicalPlan] {

  /** timestamp_micros(n div 1000) over a long attribute → n. */
  private object Conv {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(IntegralDivide(attr: Attribute, Literal(1000L, LongType), _))
          if attr.dataType == LongType =>
        Some(attr)
      case _ => None
    }
  }

  private def rawBound(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(Conv(n), Literal(t: Long, TimestampType)) =>
      Some(GreaterThanOrEqual(n, Literal(t * 1000L - 999L, LongType)))
    case GreaterThan(Conv(n), Literal(t: Long, TimestampType)) =>
      Some(GreaterThanOrEqual(n, Literal(t * 1000L + 1L, LongType)))
    case LessThanOrEqual(Conv(n), Literal(t: Long, TimestampType)) =>
      Some(LessThanOrEqual(n, Literal(t * 1000L + 999L, LongType)))
    case LessThan(Conv(n), Literal(t: Long, TimestampType)) =>
      Some(LessThanOrEqual(n, Literal(t * 1000L - 1L, LongType)))
    case EqualTo(Conv(n), Literal(t: Long, TimestampType)) =>
      Some(And(
        GreaterThanOrEqual(n, Literal(t * 1000L - 999L, LongType)),
        LessThanOrEqual(n, Literal(t * 1000L + 999L, LongType))))
    // mirrored literal-first forms
    case GreaterThanOrEqual(Literal(t: Long, TimestampType), Conv(n)) =>
      Some(LessThanOrEqual(n, Literal(t * 1000L + 999L, LongType)))
    case LessThanOrEqual(Literal(t: Long, TimestampType), Conv(n)) =>
      Some(GreaterThanOrEqual(n, Literal(t * 1000L - 999L, LongType)))
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = conjuncts(cond)
      val extra = existing
        .flatMap(rawBound)
        .filterNot(rb => existing.exists(_.semanticEquals(rb)))
      if (extra.isEmpty) f
      else Filter((existing ++ extra).reduce(And), child)
  }
}
