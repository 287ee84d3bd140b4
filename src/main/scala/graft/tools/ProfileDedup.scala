package graft.tools

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the minhash pipeline to find the hot step. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    t("range warm")(spark.range(1000000).count())
    t("range again")(spark.range(1000000).count())
    val docsRaw = Tables.documents(spark, dir)
    t("count docs no-repart")(docsRaw.count())
    t("count docs no-repart 2")(docsRaw.count())
    val docs = docsRaw.repartition(32, col("doc_id"))
    t("count docs")(docs.count())
    t("count docs 2")(docs.count())
    val sh = docs.select(col("doc_id"), shingles(col("text"), 5).as("sh")).filter(size(col("sh")) > 0)
    t("shingle build (count)")(sh.count())
    t("shingle build again")(sh.count())
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    t("explode+count")(ex.count())
    val hashed = ex.select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    val aggs = (0 until 64).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    val sigs = hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    t("64-perm min aggs")(sigs.count())
    val sig = sigs.select(col("doc_id"), array((0 until 64).map(i => col(s"m$i")): _*).as("sig"))
    val bandsDf = sig.select(col("doc_id"), explode(bandKeys(col("sig"), 8, 8)).as("bkey"))
    t("band keys")(bandsDf.count())
    val cand = bandsDf.as("x")
      .join(bandsDf.as("y"), col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    t("candidates")(cand.count())
    spark.stop()
  }
}
