package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. AQE's skew-join handling covers most cases
  * at runtime; explicit salting is for the pathological hot-key joins a
  * 100 TB pipeline still hits (one user/customer owning a double-digit
  * percentage of a fact table).
  */
object Skew {

  /** Salted inner equi-join for a skewed LEFT side: the left join key is
    * split into `salt` sub-keys by a deterministic hash of the whole
    * left row (so the same dataset always salts the same way), and the
    * right side is replicated `salt`× with one copy per sub-key. Result
    * equals `left.join(right, keys, "inner")` but the shuffle spreads
    * each hot key over `salt` reducers.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salt: Int
  ): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val saltCol = pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salt))
    val l = left.withColumn("__salt", saltCol)
    val r = right.withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    l.join(r, keys :+ "__salt", "inner").drop("__salt")
  }
}
