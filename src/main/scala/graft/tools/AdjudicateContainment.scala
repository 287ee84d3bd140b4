package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Adjudicates dedup_containment's recurring warm-spread reading (r13 +
  * r14 certified-calm runs both flag it >1.5×, the only such entry):
  * runs the query N times under bench conditions (cache cleared, GC,
  * short settle between samples) and prints each sample's wall time
  * plus the AQE-FINAL executed plan's join/exchange skeleton, so a
  * bimodal plan (AQE flipping a join strategy between samples) is
  * directly visible versus a constant-plan/variable-constant-factor
  * reading. Run on an idle box:
  *   sbt "runMain graft.tools.AdjudicateContainment /root/testdata/sf0.1 5"
  */
object AdjudicateContainment {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 5
    val query = if (args.length > 2) args(2) else "dedup_containment"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up absorbs JVM/codegen start-up, same as Bench
    try SparkEntry.queries(query)(spark, dir)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    (1 to n).foreach { i =>
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(500)
      val df = SparkEntry.queries(query)(spark, dir)
      // Materialize through df's OWN QueryExecution: a noop-sink write
      // wraps the logical plan in a NEW QueryExecution, leaving
      // df.queryExecution unexecuted — its executedPlan would print the
      // pre-adaptive skeleton (isFinalPlan=false) every sample and a
      // bimodal AQE flip (the thing being adjudicated) would be
      // invisible. Draining toRdd runs AdaptiveSparkPlanExec to its
      // final plan at the same full-materialization cost as the noop
      // sink.
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.foreachPartition(it => it.foreach(_ => ()))
      val sec = (System.nanoTime() - t0) / 1e9
      // the final adaptive plan: one line per join/exchange/scan node
      val skeleton = df.queryExecution.executedPlan.toString
        .linesIterator
        .map(_.trim)
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("AQEShuffleRead") || l.contains("isFinalPlan"))
        .map(_.takeWhile(_ != ',').take(120))
        .mkString("\n    ")
      println(f"[adjudicate] $query sample $i: $sec%.3f s")
      println(s"    $skeleton")
    }
    spark.stop()
  }
}
