package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Clone-scaled stress for the TEXT kernel family — the one headline
  * family without 10× receipts after the dedup (r6), ANN (r7),
  * event/time-series (r8), join/window/asof and aggregate/set (r12)
  * campaigns. The documents table is cloned `factor`× with doc_id
  * offsets (the same shape StressSkew's uniform fixture uses), so
  * per-doc work scales with the corpus while vocabulary statistics
  * densify naturally.
  *
  * Run (fixture built once per factor, reused):
  *   sbt "runMain graft.tools.StressText /root/testdata/sf0.1 /tmp/stresstext1 1"
  *   sbt "runMain graft.tools.StressText /root/testdata/sf0.1 /tmp/stresstext10 10"
  */
object StressText {

  val defaultQueries: Seq[String] = Seq(
    "text_stats", "text_tokens", "text_quality", "text_fingerprint",
    "text_normalize", "text_chunk", "text_winnow", "text_classifier",
    "text_quality_lm", "bpe_pair_counts", "corpus_clean")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/stresstext10"
    val factor = if (args.length > 2) args(2).toInt else 10
    val names = if (args.length > 3) args.drop(3).toSeq else defaultQueries

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    buildFixture(spark, sfDir, outDir, factor)

    def time(name: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, outDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    try time("text_stats") catch { case e: Throwable => println(s"warmup: $e") }
    println(s"| query | ${factor}x |")
    names.foreach { n =>
      val t =
        try f"${time(n)}%.1f s"
        catch { case e: Throwable => s"FAIL ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}" }
      println(s"| $n | $t |")
    }
    spark.stop()
  }

  def buildFixture(spark: SparkSession, sfDir: String, outDir: String, factor: Int): Unit = {
    val done = new java.io.File(s"$outDir/_built_$factor")
    if (done.exists()) { println(s"[text] fixture at $outDir exists, reusing"); return }
    val DOC = 10000L // doc_id clone offset step (sf0.1 max doc_id 4999)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val clones = spark.range(factor).select(col("id").cast("int").as("clone"))
    docs.crossJoin(clones)
      .select(
        ((col("doc_id") + col("clone").cast("long") * DOC).as("doc_id") +:
          docs.columns.filterNot(_ == "doc_id").map(col)).toIndexedSeq: _*)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // embeddings unscaled: none of the text kernels read them, but a
    // queries() entry probing the dir must not 404
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    done.createNewFile()
    println(s"[text] fixture built at $outDir (${factor}x documents)")
  }
}
