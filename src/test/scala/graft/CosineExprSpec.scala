package graft

import graft.functions.{CosineSimilarity, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen'd CosineSimilarity expression must be bit-identical
  * to the HOF-composed reference formula on real embeddings, and usable
  * from SQL via GraftExtensions.
  */
class CosineExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("native expression equals HOF cosine bit-for-bit") {
    val e = Tables.embeddings(spark, dir)
    val probe = e.filter(col("vec_id") === 0)
      .select(VectorFunctions.toDouble(col("embedding")).as("probe"))
    val both = e.crossJoin(broadcast(probe))
      .select(
        col("vec_id"),
        VectorFunctions.cosineF(col("embedding"), col("probe")).as("hof"),
        CosineSimilarity.cosineSim(
          VectorFunctions.toDouble(col("embedding")), col("probe")).as("native"),
        // float-input path of the native expression
        CosineSimilarity.cosineSim(col("embedding"), col("probe")).as("native_f")
      )
    // a NULL native value makes `=!=` evaluate to NULL — the row would
    // silently drop out of `bad` and a completely-broken expression
    // (all NULLs) would pass; guard the comparison population first
    val total = both.count()
    assert(total > 0, "probe row missing: comparison is over zero rows")
    assert(both.filter(col("hof").isNull || col("native").isNull ||
      col("native_f").isNull).count() == 0, "NULL outputs in the comparison")
    val bad = both.filter(col("hof") =!= col("native") || col("hof") =!= col("native_f"))
    assert(bad.count() == 0, "native cosine differs from HOF reference")
  }

  test("cosine_sim is SQL-registered via GraftExtensions") {
    // TestSpark builds the session WITH spark.sql.extensions =
    // GraftExtensions — drive the SQL name straight through it, no
    // manual registration (which would mask a lost injectFunction)
    Tables.embeddings(spark, dir).createOrReplaceTempView("emb")
    val rows = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb a JOIN emb b ON b.vec_id = 0
        |WHERE a.vec_id < 10""".stripMargin
    ).collect()
    assert(rows.length == 10)
    assert(rows.forall(!_.isNullAt(1)), "cosine_sim returned NULLs via SQL")
  }
}
