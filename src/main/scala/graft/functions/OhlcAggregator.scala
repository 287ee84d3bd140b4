package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One tick: full-precision event time (epoch nanos), a unique
  * tiebreaker id, and the value.
  */
case class Tick(tsNanos: Long, eventId: Long, value: Double)

/** Mutable-free OHLC buffer: open/close are tracked with their ordering
  * keys (tsNanos, eventId) so merge order can't change the result.
  */
case class OhlcBuf(
    openTs: Long, openId: Long, open: Double,
    closeTs: Long, closeId: Long, close: Double,
    high: Double, low: Double, volume: Double, n: Long
)

case class Ohlc(open: Double, high: Double, low: Double, close: Double, volume: Double, n: Long)

/** Single-pass typed OHLC aggregation — the `Aggregator[IN, BUF, OUT]`
  * form of the resample operator (SURVEY.md §2 UDF surface): open =
  * value at the minimum (ts, id), close = at the maximum, plus
  * high/low/volume/count, all in one shuffle with map-side partial
  * aggregation. Deterministic under any merge order because the
  * open/close choice is keyed, not positional.
  */
object OhlcAggregator extends Aggregator[Tick, OhlcBuf, Ohlc] {

  override def zero: OhlcBuf = OhlcBuf(
    Long.MaxValue, Long.MaxValue, 0.0,
    Long.MinValue, Long.MinValue, 0.0,
    Double.NegativeInfinity, Double.PositiveInfinity, 0.0, 0L
  )

  private def earlier(ts1: Long, id1: Long, ts2: Long, id2: Long): Boolean =
    ts1 < ts2 || (ts1 == ts2 && id1 < id2)

  override def reduce(b: OhlcBuf, t: Tick): OhlcBuf = {
    val (oTs, oId, o) =
      if (earlier(t.tsNanos, t.eventId, b.openTs, b.openId)) (t.tsNanos, t.eventId, t.value)
      else (b.openTs, b.openId, b.open)
    val (cTs, cId, c) =
      if (earlier(b.closeTs, b.closeId, t.tsNanos, t.eventId)) (t.tsNanos, t.eventId, t.value)
      else (b.closeTs, b.closeId, b.close)
    OhlcBuf(oTs, oId, o, cTs, cId, c,
      math.max(b.high, t.value), math.min(b.low, t.value),
      b.volume + t.value, b.n + 1)
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
        math.max(a.high, b.high), math.min(a.low, b.low),
        a.volume + b.volume, a.n + b.n)
    }
  }

  override def finish(b: OhlcBuf): Ohlc =
    Ohlc(b.open, b.high, b.low, b.close, b.volume, b.n)

  override def bufferEncoder: Encoder[OhlcBuf] = Encoders.product[OhlcBuf]
  override def outputEncoder: Encoder[Ohlc] = Encoders.product[Ohlc]
}
