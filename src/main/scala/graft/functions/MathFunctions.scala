package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.graft.Bridge

/** Domain-neutral numeric Column helpers. */
object MathFunctions {

  /** Exact long integer division (a native IntegralDivide) — the
    * cross-engine-safe way to scale rationals to fixed-point integers
    * (float round() implementations disagree on half boundaries; integer
    * division cannot) and to compute grid/bucket ids from epoch integers
    * (double-divide-and-cast rests on ULP headroom; this does not).
    */
  def intDiv(a: Column, b: Column): Column =
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
}
