package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Receipt tool for the fn_json ratio investigation (round-11 ask):
  * times the candidate single-field JSON extraction shapes over the
  * sf events table, fully materialized through the noop sink, medians
  * of 5. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.JsonBench"
  */
object JsonBench {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-json-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables.events(spark, sf).cache()
    ev.count() // warm the cache so the scan is off the table

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = runs(2)
      println(f"$name%-28s median ${med}%.3f s  (runs: ${runs.map(r => f"$r%.3f").mkString(", ")})")
      med
    }

    time("get_json_object+sort") {
      ev.select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .orderBy("event_id")
    }
    time("get_json_object") {
      ev.select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
    }
    time("from_json+sort") {
      ev.select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k_val"))
        .orderBy("event_id")
    }
    time("from_json") {
      ev.select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k_val"))
    }
    time("sort_only") {
      ev.select(col("event_id"), col("value").as("k_val")).orderBy("event_id")
    }
    spark.stop()
  }
}
