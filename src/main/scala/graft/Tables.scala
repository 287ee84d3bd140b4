package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver corpus (one parquet per table, TESTDATA.md).
  *
  * `events.parquet` has shipped `ts` in two physical vintages across
  * driver generations: parquet TIMESTAMP(NANOS) — which Spark 4's
  * reader rejects natively (PARQUET_TYPE_ILLEGAL), so sessions set
  * `spark.sql.legacy.parquet.nanosAsLong=true` and the column arrives
  * as long nanos — and parquet TIMESTAMP(MICROS) (isAdjustedToUTC
  * false), which Spark reads as TIMESTAMP_NTZ by default. Every loader
  * here branches on the footer schema so either vintage yields the same
  * TimestampType column: nanos convert with `timestamp_micros(ts div
  * 1000)` (lossless, the corpus is µs-aligned), micros read natively —
  * sessions set `spark.sql.parquet.inferTimestampNTZ.enabled=false` so
  * the column arrives directly as session-tz TimestampType (all engine
  * sessions pin UTC, matching DuckDB's naive reading on the oracle
  * side, and native timestamp predicates push into the scan with
  * row-group stat pruning — no conversion expression in the way).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** SESSION-WIDE SIDE EFFECT: loading events pins two SQL confs for
    * the whole SparkSession, not just this read — `nanosAsLong=true`
    * (NANOS-vintage parquet reads as long instead of throwing) and
    * `inferTimestampNTZ.enabled=false` (MICROS-vintage reads as
    * session-tz TimestampType). They cannot be set-and-restored around
    * this call: DataFrames are lazy, and the file source consults the
    * session conf again at planning/execution, long after this method
    * returned — a restored conf would flip the already-returned frame's
    * meaning mid-plan. Consequence for mixed workloads: after any
    * events load, OTHER parquet reads in the same session also stop
    * inferring TIMESTAMP_NTZ (they get session-tz timestamps) and read
    * TIMESTAMP(NANOS) columns as raw longs. Every graft session already
    * pins both confs at build time (TestSpark, Bench, Verify builders),
    * so in-engine nothing changes; a host application that needs NTZ
    * inference elsewhere must read those tables through an explicit
    * `.schema(...)`.
    */
  private def rawEvents(spark: SparkSession, dir: String): DataFrame = {
    // runtime SQL confs; wrapped for sessions that pinned them static
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    try spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    catch { case _: Throwable => () }
    table(spark, dir, "events")
  }

  /** Physical type `ts` arrives as from this corpus directory (driver
    * footer read only). LongType = nanos vintage; TimestampType (or
    * TIMESTAMP_NTZ if a session re-enabled inference) = micros vintage.
    */
  def eventsTsType(spark: SparkSession, dir: String): DataType =
    rawEvents(spark, dir).schema("ts").dataType

  private def toTimestamp(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** events with `ts` as a proper TimestampType column.
    *
    * NB: on the nanos vintage, predicates placed on the converted `ts`
    * only reach the parquet scan via the NanosRangePushdown rule — for
    * time-range scans prefer [[eventsInRange]]/[[eventsWhere]], which
    * filter in the raw domain so row-group min/max pruning works at
    * scale on either vintage.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    toTimestamp(rawEvents(spark, dir))

  /** events filtered by a predicate built in the RAW `ts` domain —
    * `pred` receives the raw ts column and a literal builder turning an
    * ISO-8601 UTC instant into a same-domain literal, so the filter
    * sits directly on the scanned attribute (row-group pruning) before
    * any conversion.
    */
  def eventsWhere(spark: SparkSession, dir: String)(
      pred: (Column, String => Column) => Column): DataFrame = {
    val raw = rawEvents(spark, dir)
    val tsLit: String => Column = raw.schema("ts").dataType match {
      case LongType =>
        iso => lit(java.time.Instant.parse(iso).toEpochMilli * 1000000L)
      case TimestampNTZType =>
        iso =>
          lit(java.time.LocalDateTime.ofInstant(
            java.time.Instant.parse(iso), java.time.ZoneOffset.UTC))
      case _ =>
        iso => lit(java.time.Instant.parse(iso))
    }
    toTimestamp(raw.filter(pred(col("ts"), tsLit)))
  }

  /** Inclusive UTC time-range scan of events with the range predicate
    * pushed into the parquet reader (applied in the raw `ts` domain
    * before any conversion).
    */
  def eventsInRange(spark: SparkSession, dir: String, loUtc: String, hiUtc: String): DataFrame =
    eventsWhere(spark, dir)((ts, l) => ts >= l(loUtc) && ts <= l(hiUtc))

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
