package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-skew stress for the three ops whose round-7 plans were
  * rewritten precisely because their natural keys are skewed: hot
  * Zipfian grams (dedup_substring), a single-language corpus
  * (pack_shards) and a single-event-type stream (ts_outlier_mad). Each
  * fixture makes the WORST key distribution the whole input, so any
  * residual serialize-one-key-into-one-task shape shows up as a
  * straggler wall-time cliff vs the uniform control at the same scale.
  *
  * Fixtures (built once, reused):
  *   uniform  — documents cloned `factor`x, lang mix preserved (control)
  *   hotgram  — uniform + the SAME 5-token span appended to every doc:
  *              one gram with `factor`*5000 occurrences (>= 10^5 at
  *              100x), the pathological license-boilerplate shape
  *   onelang  — uniform with lang forced to 'en': the entire corpus is
  *              ONE ordered prefix-sum partition under the naive plan
  *   onetype  — events from an existing StressRel fixture with
  *              event_type forced to 'click': one histogram group
  *
  * Run:  sbt "runMain graft.tools.StressSkew /root/testdata/sf0.1 /tmp/stressskew 100 /tmp/stressrel100"
  */
object StressSkew {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/stressskew"
    val factor = if (args.length > 2) args(2).toInt else 100
    val relDir = if (args.length > 3) args(3) else "/tmp/stressrel100"

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

    buildFixtures(spark, sfDir, outDir, factor, relDir)

    def time(name: String, dir: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up absorbs JVM/codegen start-up
    try time("text_stats", s"$outDir/uniform")
    catch { case e: Throwable => println(s"warmup: $e") }

    val runs = Seq(
      ("dedup_substring", s"$outDir/uniform", "uniform"),
      ("dedup_substring", s"$outDir/hotgram", "hotgram"),
      ("pack_shards", s"$outDir/uniform", "uniform"),
      ("pack_shards", s"$outDir/onelang", "onelang"),
      ("ts_outlier_mad", relDir, "uniform"),
      ("ts_outlier_mad", s"$outDir/onetype", "onetype")
    )
    println(s"| query | fixture | ${factor}x |")
    runs.foreach { case (q, dir, tag) =>
      val t =
        try f"${time(q, dir)}%.1f s"
        catch { case e: Throwable => s"FAIL ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}" }
      println(s"| $q | $tag | $t |")
    }
    spark.stop()
  }

  /** Hot span: 5 tokens no real doc contains (wsTokens splits on
    * whitespace, so these are single tokens verbatim). */
  private val hotSpan = "qqhot0 qqhot1 qqhot2 qqhot3 qqhot4"

  def buildFixtures(
      spark: SparkSession, sfDir: String, outDir: String, factor: Int, relDir: String): Unit = {
    val done = new java.io.File(s"$outDir/_built_$factor")
    if (done.exists()) { println(s"[skew] fixtures at $outDir exist, reusing"); return }

    val DOC = 10000L // doc_id clone offset step (sf0.1 max doc_id 4999)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val clones = spark.range(factor).select(col("id").cast("int").as("clone"))
    val cloned = docs.crossJoin(clones)
      .select(
        ((col("doc_id") + col("clone").cast("long") * DOC).as("doc_id") +:
          docs.columns.filterNot(_ == "doc_id").map(col)).toIndexedSeq: _*)

    def writeDocs(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name/documents.parquet")
      println(s"[skew] wrote $name")
    }
    writeDocs(cloned, "uniform")
    writeDocs(
      cloned.withColumn("text", concat(col("text"), lit(" " + hotSpan))),
      "hotgram")
    writeDocs(cloned.withColumn("lang", lit("en")), "onelang")

    // events: reuse the relational 100x fixture (already cloned with
    // key offsets + ts jitter), squashed to a single histogram group
    spark.read.parquet(s"$relDir/events.parquet")
      .withColumn("event_type", lit("click"))
      .write.mode("overwrite").parquet(s"$outDir/onetype/events.parquet")
    println(s"[skew] wrote onetype")

    done.getParentFile.mkdirs()
    done.createNewFile()
    println(s"[skew] fixtures built at $outDir (${factor}x)")
  }
}
