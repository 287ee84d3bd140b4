package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate for bounded top-k selection. */
case class Scored(qId: Long, score: Double, vecId: Long)

/** Aggregation buffer/output: at most k candidates, best first. */
case class TopKBuf(items: Seq[Scored])

/** Bounded top-k selection as a typed `Aggregator` — the shape that
  * survives batch kNN at 100 TB: the buffer holds AT MOST k rows, so
  * map-side partial aggregation reduces each partition's contribution
  * to k candidates per query BEFORE the shuffle, and the exchange
  * carries O(partitions × k) rows per query instead of the full n×q
  * candidate set a `row_number` ranking window would sort and shuffle.
  *
  * Deterministic under any reduce/merge order: candidates are kept
  * under the total order (score DESC, vecId ASC) — vecIds are unique,
  * so ties cannot reorder — which is also the output order (rank 1
  * first).
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {
  require(k > 0, "k must be positive")

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.vecId < b.vecId)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, in: Scored): TopKBuf =
    if (b.items.size >= k && better(b.items.last, in)) b
    else TopKBuf((b.items :+ in).sortWith(better).take(k))

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    if (a.items.isEmpty) b
    else if (b.items.isEmpty) a
    else TopKBuf((a.items ++ b.items).sortWith(better).take(k))

  override def finish(r: TopKBuf): TopKBuf = r

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
