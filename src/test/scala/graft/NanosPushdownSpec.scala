package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Natural-form range filters on the events `ts` must reach the parquet
  * scan on either corpus vintage (graft.Tables): on the TIMESTAMP(NANOS)
  * vintage via the NanosRangePushdown optimizer rule (converted-column
  * predicates get a raw-nanos scan bound), on the TIMESTAMP(MICROS)
  * vintage natively (the column is a plain timestamp attribute).
  */
class NanosPushdownSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  def lit_ts(s: String) = lit(java.sql.Timestamp.valueOf(s))
  lazy val nanosVintage = Tables.eventsTsType(spark, dir) == LongType

  test("natural-form ts range filter is pushed to the scan") {
    val q = Tables.events(spark, dir)
      .filter(col("ts") >= lit_ts("2024-01-10 00:00:00") &&
        col("ts") <= lit_ts("2024-01-20 00:00:00"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    if (nanosVintage)
      assert(
        plan.contains("GreaterThanOrEqual(ts,1704844799999999001")
          && plan.contains("LessThanOrEqual(ts,1705708800000000999"),
        s"expected nanos-domain pushed range:\n$plan")
    else
      assert(
        plan.contains("GreaterThanOrEqual(ts,") && plan.contains("LessThanOrEqual(ts,"),
        s"expected native timestamp pushed range:\n$plan")
    // result equality with the hand-pushed helper
    val expect = Tables.eventsInRange(spark, dir, "2024-01-10T00:00:00Z", "2024-01-20T00:00:00Z")
    assert(q.count() == expect.count())
    assert(q.exceptAll(expect).count() == 0)
  }

  test("strict bounds and mixed predicates stay exact") {
    val q = Tables.events(spark, dir)
      .filter(col("ts") > lit_ts("2024-01-10 00:00:00") &&
        col("ts") < lit_ts("2024-01-20 00:00:00") &&
        col("event_type") === "click")
    // INDEPENDENT reference: eventsWhere filters in the RAW ts domain
    // before any conversion, so it does not pass through the
    // NanosRangePushdown rewrite under test — a bound-conversion bug
    // cannot cancel out of both sides (a same-path `plain` comparison
    // would be tautological)
    val expect = Tables.eventsWhere(spark, dir)((ts, l) =>
        ts > l("2024-01-10T00:00:00Z") && ts < l("2024-01-20T00:00:00Z"))
      .filter(col("event_type") === "click")
    assert(q.count() > 0, "strict-range fixture selects nothing")
    assert(q.count() == expect.count())
    assert(q.exceptAll(expect).count() == 0)
    // the toString elides long PushedFilters lists; check the full
    // formatted explain output instead — BOTH strict bounds pinned to
    // their exact converted literals (> t → ≥ t·1000+1; < t → ≤ t·1000−1)
    val full = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    if (nanosVintage) {
      assert(full.contains("GreaterThanOrEqual(ts,1704844800000000001"), full)
      assert(full.contains("LessThanOrEqual(ts,1705708799999999999"), full)
    } else {
      assert(full.contains("GreaterThan(ts,"), full)
      assert(full.contains("LessThan(ts,"), full)
    }
  }

  test("equality predicate converges and stays exact (a single And conjunct never dedups)") {
    // pick a real timestamp so the fixture selects a row
    val one = Tables.events(spark, dir).select(col("ts")).limit(1).collect()(0).getTimestamp(0)
    // the old rewrite emitted And(ge, le) as ONE conjunct: the next
    // fixed-point pass re-split it, the semanticEquals dedup never
    // matched, and the optimizer ran to max iterations (which THROWS
    // under sbt test / Utils.isTesting) — merely optimizing this plan
    // is the regression check
    val q = Tables.events(spark, dir).filter(col("ts") === lit(one))
    assert(q.count() >= 1)
    val expect = Tables.events(spark, dir).select(col("ts"))
      .collect().count(_.getTimestamp(0) == one)
    assert(q.count() == expect)
  }

  test("a literal outside the nanos range is NOT pushed (overflowed bound would drop every row)") {
    val all = Tables.events(spark, dir).count()
    // timestamp'9999-12-31' * 1000 wraps Long: the old rule conjoined
    // the wrapped (negative) upper bound and silently returned 0 rows
    val q = Tables.events(spark, dir).filter(col("ts") <= lit_ts("9999-12-31 00:00:00"))
    assert(q.count() == all, "a far-future sentinel bound must keep every row")
    val q2 = Tables.events(spark, dir).filter(col("ts") >= lit_ts("1000-01-01 00:00:00"))
    assert(q2.count() == all, "a far-past sentinel bound must keep every row")
  }

  test("literal-first spellings push the same raw bound") {
    val q = Tables.events(spark, dir)
      .filter(lit_ts("2024-01-20 00:00:00") > col("ts"))
    val expect = Tables.eventsWhere(spark, dir)((ts, l) => ts < l("2024-01-20T00:00:00Z"))
    assert(q.count() > 0 && q.count() == expect.count())
    if (nanosVintage) {
      val full = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(full.contains("LessThanOrEqual(ts,1705708799999999999"), full)
    }
  }
}
