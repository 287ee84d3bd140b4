package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over ArrayType(FloatType) embedding columns — native
  * higher-order functions (codegen-friendly, no UDFs). All math is done
  * in double precision with strict left-to-right accumulation, which is
  * bit-identical to DuckDB's sequential list kernels (the oracle side).
  */
object VectorFunctions {

  /** Cast a float array to double elementwise. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (s, x) => s + x * x))

  /** Cosine similarity of two double arrays: dot / (|a|·|b|); a
    * zero-norm side yields 0.0 by the PINNED convention (see
    * [[CosineSimilarity]] — raw IEEE NaN would rank above every real
    * match in a descending top-k). Mismatched lengths yield NULL FIRST,
    * exactly like the native expression — without the size guard a
    * zero-norm side on a ragged pair would hit the 0.0 pin where
    * [[CosineSimilarity]] returns NULL, and the two forms are
    * documented interchangeable.
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(size(a) =!= size(b), lit(null).cast("double"))
      .otherwise(when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom))
  }

  /** Cosine similarity of two raw float-array columns. */
  def cosineF(a: Column, b: Column): Column = cosine(toDouble(a), toDouble(b))
}
