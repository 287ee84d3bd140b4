package graft

import graft.operators.{LlmOps, Relational, TimeSeries}
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * One [[Q]] per operator in SURVEY.md §2.b; assembled from the
  * per-category modules under graft.operators / graft.functions.
  */
object SparkEntry {

  /** All registered engine queries. */
  def allQueries: Seq[Q] =
    Relational.all ++ TimeSeries.all ++ LlmOps.all ++ Streams.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue rollup: lineitem ⋈ broadcast(orders-dims) — exercises scan,
    * broadcast join, hash agg, sort. Uses only ms-timestamp tables so it
    * runs under any session config.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus", "l_returnflag")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n")
      )
      .orderBy("o_orderstatus", "l_returnflag")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.impl).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
