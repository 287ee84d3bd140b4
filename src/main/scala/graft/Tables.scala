package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver corpus (one parquet per table, TESTDATA.md).
  *
  * `events.parquet` stores its `ts` column as parquet TIMESTAMP(NANOS),
  * which Spark 4's reader rejects (PARQUET_TYPE_ILLEGAL). Sessions set
  * `spark.sql.legacy.parquet.nanosAsLong=true` so the column arrives as
  * long nanos, and [[events]] converts it to TimestampType — lossless,
  * the corpus is µs-aligned, and identical to DuckDB's own nanos→µs
  * coercion (the oracle side).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` as a proper TimestampType column.
    *
    * NB: predicates placed on the converted `ts` do NOT reach the
    * parquet scan (the conversion expression blocks pushdown) — for
    * time-range scans use [[eventsInRange]], which filters in the raw
    * nanos domain so row-group min/max pruning works at scale.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () } // static conf already set at build time
    table(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Inclusive UTC time-range scan of events with the range predicate
    * pushed into the parquet reader (applied to the raw nanos column
    * before the timestamp conversion).
    */
  def eventsInRange(spark: SparkSession, dir: String, loUtc: String, hiUtc: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    def ns(iso: String) = java.time.Instant.parse(iso).toEpochMilli * 1000000L
    table(spark, dir, "events")
      .filter(col("ts") >= ns(loUtc) && col("ts") <= ns(hiUtc))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}

/** One engine query: a Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver diff-tests against.
  * Every query ends in a deterministic ORDER BY with a unique tiebreaker
  * and rounds floating aggregates, so Spark-vs-DuckDB comparison is
  * stable (SURVEY.md §5).
  */
final case class Q(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
