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
      coalesce(expr("unix_micros(ts)"), lit(Tick.NullTs)).as("tsMicros"),
      col("event_id"),
      col("value")
    ).as[(java.sql.Timestamp, String, Long, Long, Option[Double])]
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

  test("TopKAggregator: bounded buffer, deterministic under any reduce/merge order") {
    import graft.functions.{Scored, TopKAggregator, TopKBuf}
    val agg = new TopKAggregator(3)
    val rnd = new scala.util.Random(7)
    val items = (0 until 200).map(i => Scored(1L, rnd.nextInt(40) / 10.0, i.toLong))
    val expected = items.sortBy(s => (-s.score, s.vecId)).take(3)
    // sequential reduce in several shuffled orders
    (0 until 5).foreach { seed =>
      val shuffled = new scala.util.Random(seed).shuffle(items)
      val out = shuffled.foldLeft(agg.zero)(agg.reduce).items
      assert(out == expected, s"order $seed diverged: $out")
    }
    // arbitrary partition splits + merges
    (1 until 5).foreach { parts =>
      val bufs = items.grouped(items.size / parts + 1)
        .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      assert(bufs.forall(_.items.size <= 3), "buffer must stay bounded at k")
      val merged = bufs.foldLeft(TopKBuf(Vector.empty))(agg.merge).items
      assert(merged == expected)
    }
    // merge with empty on either side
    val one = agg.reduce(agg.zero, items.head)
    assert(agg.merge(agg.zero, one) == one && agg.merge(one, agg.zero) == one)

    // NaN scores (zero-norm embedding → cosine 0/0) must not break the
    // total order: Double.compare places NaN as the LARGEST score, so
    // the result is identical under every insertion order rather than
    // insertion-order dependent (primitive > is false both ways vs NaN)
    val withNaN = items.take(20) :+ Scored(1L, Double.NaN, 999L)
    val nanExpected = withNaN.foldLeft(agg.zero)(agg.reduce).items
    assert(nanExpected.head.vecId == 999L, "NaN must surface at rank 1, not hide")
    (0 until 5).foreach { seed =>
      val shuffled = new scala.util.Random(seed).shuffle(withNaN)
      assert(shuffled.foldLeft(agg.zero)(agg.reduce).items == nanExpected,
        s"NaN order $seed diverged")
    }
  }

  test("sim_knn_batch: partial (map-side) top-k aggregation, no ranking window in the plan") {
    val df = SparkEntry.queries("sim_knn_batch")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"ranking window in plan — full n*q candidate sort:\n$plan")
    assert(plan.contains("partial_topkaggregator"),
      s"expected map-side partial TopKAggregator in plan:\n$plan")
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
