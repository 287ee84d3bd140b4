package graft

import graft.functions.{CosineSimilarity, TextExprs, VectorKernels}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The kernel library is a real SQL surface, not internals:
  * GraftExtensions registers every native expression, and the SQL path
  * must produce bit-identical results to the DataFrame path (same
  * Expression class underneath — this spec guards the registration
  * plumbing: argument order, arity checks, type resolution).
  */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  lazy val vecs: DataFrame = {
    val rnd = new scala.util.Random(5)
    (0 until 200).map { i =>
      (i.toLong,
        Array.fill(16)(rnd.nextGaussian().toFloat),
        Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("id", "a", "b")
  }

  lazy val docs: DataFrame = {
    val rnd = new scala.util.Random(9)
    val vocab = Array.tabulate(50)(i => s"w$i")
    ((0 until 100).map { i =>
      (i.toLong, Array.fill(30)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    } :+ (100L, "too short")) // < 5 tokens: minhash_band must be NULL
      .toDF("id", "text")
  }

  def sameResults(sql: DataFrame, api: DataFrame): Unit = {
    val s = sql.collect().toSeq
    val a = api.collect().toSeq
    assert(s == a, s"SQL path diverged from DataFrame path:\n sql=${s.take(3)}\n api=${a.take(3)}")
    assert(s.nonEmpty)
  }

  test("cosine_sim / l2sq / vec_dot: SQL == DataFrame, elementwise") {
    vecs.createOrReplaceTempView("v")
    sameResults(
      spark.sql("SELECT id, cosine_sim(a, b) AS c, l2sq(a, b) AS l, vec_dot(a, b) AS d FROM v ORDER BY id"),
      vecs.select(col("id"),
        CosineSimilarity.cosineSim(col("a"), col("b")).as("c"),
        VectorKernels.l2sq(col("a"), col("b")).as("l"),
        VectorKernels.dot(col("a"), col("b")).as("d")).orderBy("id"))
  }

  test("pq_argmin: SQL == DataFrame, including the smallest-cell tie-break") {
    // duplicate codebook entries under different cell ids force d2 ties:
    // the smallest cell must win on BOTH paths (and regardless of the
    // codebook array's ordering — entries deliberately unsorted)
    val withCb = vecs.withColumn("cb", expr(
      """array(named_struct('cell', 7L, 'c', slice(b, 1, 16)),
        |      named_struct('cell', 2L, 'c', slice(b, 1, 16)),
        |      named_struct('cell', 5L, 'c', slice(a, 1, 16)))""".stripMargin))
    withCb.createOrReplaceTempView("vcb")
    val sql = spark.sql(
      "SELECT id, pq_argmin(a, cb) AS pq FROM vcb ORDER BY id")
    val api = withCb
      .select(col("id"), VectorKernels.pqArgmin(col("a"), col("cb")).as("pq"))
      .orderBy("id")
    sameResults(sql, api)
    // tie case: query == b, entries 7 and 2 are both exact matches →
    // cell 2 — asserted on BOTH paths (the SQL query must tie-break in
    // the registered expression too, not just the DataFrame builder)
    val sqlTie = spark.sql("SELECT pq_argmin(b, cb).cell AS cell FROM vcb")
      .as[Long].collect()
    val apiTie = withCb.select(VectorKernels.pqArgmin(col("b"), col("cb")).as("pq"))
      .selectExpr("pq.cell").as[Long].collect()
    assert(sqlTie.nonEmpty && sqlTie.forall(_ == 2L),
      "SQL path: equal-d2 tie must resolve to the smallest cell")
    assert(apiTie.nonEmpty && apiTie.forall(_ == 2L),
      "DataFrame path: equal-d2 tie must resolve to the smallest cell")
  }

  test("simhash64 / minhash_band: SQL == DataFrame, NULL for unshingleable docs") {
    docs.createOrReplaceTempView("d")
    sameResults(
      spark.sql("SELECT id, simhash64(text) AS sh, minhash_band(text, 4) AS mb FROM d ORDER BY id"),
      docs.select(col("id"),
        TextExprs.simhash64(col("text")).as("sh"),
        TextExprs.minhashBand(col("text"), lit(4)).as("mb")).orderBy("id"))
    val short = spark.sql("SELECT minhash_band(text, 4) FROM d WHERE id = 100").collect()
    assert(short.head.isNullAt(0), "a 2-token doc cannot 5-shingle: NULL band")
    // and the SQL values equal the raw kernel outputs (plumbing didn't
    // reroute to a different code path)
    val kern = docs.filter(col("id") < 100).orderBy("id").select("text").as[String].collect()
      .map(t => graft.functions.TextKernels.simhashSig(t))
    val sqlv = spark.sql("SELECT simhash64(text) FROM d WHERE id < 100 ORDER BY id")
      .as[Long].collect()
    assert(kern.toSeq == sqlv.toSeq)
  }

  test("registration rejects wrong arity with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0d)) ").collect()
    }
    assert(e.getMessage.contains("cosine_sim"))
    // the error must be the ARITY check, not 'Undefined function' — a
    // lost registration would also mention the name and mask the real
    // regression behind this test's pass
    assert(!e.getMessage.toLowerCase.contains("undefined function")
      && !e.getMessage.contains("UNRESOLVED_ROUTINE"),
      s"cosine_sim is not registered at all: ${e.getMessage}")
    assert(e.getMessage.toLowerCase.matches("(?s).*(arity|argument|parameter).*"),
      s"not an arity error: ${e.getMessage}")
  }
}
