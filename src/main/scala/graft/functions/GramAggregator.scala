package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass d×d integer Gram matrix (Σ over rows of cq·cqᵀ) as a typed
  * Aggregator: each partition folds its vectors into ONE flat
  * `Array[Long](d*d)` buffer (row-major (i,j) = i*d+j) and partials
  * merge by elementwise add — so the Gram never materializes as n·d²
  * exploded rows (the HOF transform×transform + groupBy(i,j) shape this
  * replaces generated 4096 struct rows per vector through interpreted
  * lambdas). Addition of products over rows is commutative/associative
  * in BIGINT, so the sums are bit-identical to the exploded form under
  * any partitioning or merge order — the integer-exact oracle is
  * unaffected. Buffer is d²·8 bytes (32 KiB at d=64) per partition:
  * constant at any corpus scale.
  */
class GramAggregator(d: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](d * d)

  override def reduce(b: Array[Long], cq: Array[Long]): Array[Long] = {
    require(cq.length == d, s"expected $d-dim vector, got ${cq.length}")
    var i = 0
    while (i < d) {
      val vi = cq(i)
      if (vi != 0L) {
        val base = i * d
        var j = 0
        while (j < d) { b(base + j) += vi * cq(j); j += 1 }
      }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < a.length) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
