package graft

import graft.functions.{OhlcAggregator, Tick}
import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("one-pass OHLC Aggregator equals the window-based resample query") {
    val sp = spark
    import sp.implicits._
    val e = Tables.events(spark, dir)
    val ds = e.select(
      date_trunc("day", col("ts")).as("day"),
      col("event_type"),
      expr("unix_micros(ts) * 1000L").as("tsNanos"),
      col("event_id"),
      col("value")
    ).as[(java.sql.Timestamp, String, Long, Long, Double)]
    val agg = ds
      .groupByKey(t => (t._1, t._2))
      .mapValues(t => Tick(t._3, t._4, t._5))
      .agg(OhlcAggregator.toColumn.name("ohlc"))
      .toDF("key", "ohlc")
      .select(
        col("key._1").as("day"), col("key._2").as("event_type"),
        col("ohlc.open").as("open"),
        round(col("ohlc.high"), 6).as("high"),
        round(col("ohlc.low"), 6).as("low"),
        col("ohlc.close").as("close"),
        round(col("ohlc.volume"), 4).as("volume"),
        col("ohlc.n").as("n")
      )
    val windowed = SparkEntry.queries("resample_ohlcv")(spark, dir)
    assert(agg.exceptAll(windowed).count() == 0)
    assert(windowed.exceptAll(agg).count() == 0)
  }

  test("salted join equals plain inner join") {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"), "inner")
      .select("o_orderkey", "c_name")
    val salted = Skew.saltedJoin(orders, customer, Seq("o_custkey"), 8)
      .select("o_orderkey", "c_name")
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }
}
