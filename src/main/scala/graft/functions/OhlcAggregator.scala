package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One tick: the event time as an ORDERING KEY (epoch micros —
  * TimestampType's native precision, so nothing finer exists to lose;
  * the field name is historical from a ×1000 nanos encoding that only
  * added overflow range), a unique tiebreaker id, and the (nullable —
  * SQL semantics) value. A NULL event time maps to [[Tick.NullTs]]
  * BEFORE the typed boundary: the NULL-time rows all share one
  * resample group (date_trunc(NULL) is NULL), so within that group
  * ordering falls to the id tiebreaker — exactly the comparison SQL's
  * `ORDER BY ts, event_id` makes when ts is constant-NULL across the
  * partition.
  */
case class Tick(tsNanos: Long, eventId: Long, value: Option[Double])

object Tick {
  /** Sentinel for a NULL event time (see class doc). Strictly above the
    * aggregator's zero-buffer close key and below every real ordering
    * key: a collision needs a timestamp at exactly MinValue+1 µs
    * (~year −294247, one µs after Spark's minimum representable
    * instant) — outside any domain the resample family admits.
    */
  val NullTs: Long = Long.MinValue + 1
}

/** Mutable-free OHLC buffer: open/close are tracked with their ordering
  * keys (tsNanos, eventId) so merge order can't change the result.
  * Value fields are Options — SQL aggregates over a nullable column:
  * open/close are the (possibly NULL) values AT the ordering extremes;
  * high/low/volume ignore NULL values and are NULL when no value was
  * observed (round-13 NULL-robustness campaign).
  */
case class OhlcBuf(
    openTs: Long, openId: Long, open: Option[Double],
    closeTs: Long, closeId: Long, close: Option[Double],
    high: Option[Double], low: Option[Double], volume: Option[Double], n: Long
)

case class Ohlc(
    open: Option[Double], high: Option[Double], low: Option[Double],
    close: Option[Double], volume: Option[Double], n: Long)

/** Single-pass typed OHLC aggregation — the `Aggregator[IN, BUF, OUT]`
  * form of the resample operator (SURVEY.md §2 UDF surface): open =
  * value at the minimum (ts, id), close = at the maximum, plus
  * high/low/volume/count, all in one shuffle with map-side partial
  * aggregation. Deterministic under any merge order because the
  * open/close choice is keyed, not positional.
  */
object OhlcAggregator extends Aggregator[Tick, OhlcBuf, Ohlc] {

  override def zero: OhlcBuf = OhlcBuf(
    Long.MaxValue, Long.MaxValue, None,
    Long.MinValue, Long.MinValue, None,
    None, None, None, 0L
  )

  private def earlier(ts1: Long, id1: Long, ts2: Long, id2: Long): Boolean =
    ts1 < ts2 || (ts1 == ts2 && id1 < id2)

  // Double.compare, NOT math.min/max: Spark's builtin min/max order
  // doubles with NaN GREATEST and -0.0 < +0.0 (java.lang.Double.compare
  // semantics), so min over {NaN, 0.0} is 0.0 — while math.min
  // NaN-poisons (math.min(NaN, x) = NaN) and one NaN tick would flip
  // this aggregator's low/high away from the builtin path and the
  // DuckDB oracle (found by the round-16 NaN/Inf corpus lane).
  private def mergeMax(a: Option[Double], b: Option[Double]): Option[Double] =
    (a, b) match {
      case (Some(x), Some(y)) =>
        Some(if (java.lang.Double.compare(x, y) >= 0) x else y)
      case _ => a.orElse(b)
    }
  private def mergeMin(a: Option[Double], b: Option[Double]): Option[Double] =
    (a, b) match {
      case (Some(x), Some(y)) =>
        Some(if (java.lang.Double.compare(x, y) <= 0) x else y)
      case _ => a.orElse(b)
    }
  private def mergeSum(a: Option[Double], b: Option[Double]): Option[Double] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(x + y)
      case _ => a.orElse(b)
    }

  override def reduce(b: OhlcBuf, t: Tick): OhlcBuf = {
    val (oTs, oId, o) =
      if (earlier(t.tsNanos, t.eventId, b.openTs, b.openId)) (t.tsNanos, t.eventId, t.value)
      else (b.openTs, b.openId, b.open)
    val (cTs, cId, c) =
      if (earlier(b.closeTs, b.closeId, t.tsNanos, t.eventId)) (t.tsNanos, t.eventId, t.value)
      else (b.closeTs, b.closeId, b.close)
    OhlcBuf(oTs, oId, o, cTs, cId, c,
      mergeMax(b.high, t.value), mergeMin(b.low, t.value),
      mergeSum(b.volume, t.value), b.n + 1)
  }

  override def merge(a: OhlcBuf, b: OhlcBuf): OhlcBuf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val (oTs, oId, o) =
        if (earlier(a.openTs, a.openId, b.openTs, b.openId)) (a.openTs, a.openId, a.open)
        else (b.openTs, b.openId, b.open)
      val (cTs, cId, c) =
        if (earlier(a.closeTs, a.closeId, b.closeTs, b.closeId)) (b.closeTs, b.closeId, b.close)
        else (a.closeTs, a.closeId, a.close)
      OhlcBuf(oTs, oId, o, cTs, cId, c,
        mergeMax(a.high, b.high), mergeMin(a.low, b.low),
        mergeSum(a.volume, b.volume), a.n + b.n)
    }
  }

  override def finish(b: OhlcBuf): Ohlc =
    Ohlc(b.open, b.high, b.low, b.close, b.volume, b.n)

  override def bufferEncoder: Encoder[OhlcBuf] = Encoders.product[OhlcBuf]
  override def outputEncoder: Encoder[Ohlc] = Encoders.product[Ohlc]
}
