package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** In-repo pins for the round-13 NULL-robustness campaign: the four
  * corpora gates (tools/nullify.py + the DuckDB oracle replay) proved
  * cross-engine parity, but they run outside `sbt test` — these
  * fixtures hand-compute the subtlest chosen semantics so a regression
  * fails the suite, not just the external gate.
  */
class NullSemanticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOfJoin: NULL-time rows join nothing — left keeps its row, right never matches") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L),
      (2L, null.asInstanceOf[Timestamp], 7L) // time-less purchase
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), 7L),
      (11L, null.asInstanceOf[Timestamp], 7L) // time-less click
    ).toDF("event_id", "ts", "user_id")
    for (fwd <- Seq(false, true)) {
      val out = TimeSeries.asOfJoin(
        left, right, "user_id", "ts", "ts",
        Seq("event_id" -> "click_id"), forward = fwd)
        .select("event_id", "click_id")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(out.size == 2, s"left join must keep both rows (forward=$fwd)")
      // row 1 matches click 10 backward (09:00 <= 10:00); forward has
      // no click at/after 10:00 — and the NULL-ts click 11 must never
      // be that match
      assert(out(1L) == (if (fwd) None else Some(10L)), s"forward=$fwd")
      // the NULL-ts purchase matches nothing in either direction
      assert(out(2L).isEmpty, s"NULL-ts left row must match nothing (forward=$fwd)")
    }
  }

  test("OhlcAggregator: open/close surface the ordering-extreme row's possibly-NULL value; h/l/v ignore NULLs; n counts all") {
    import graft.functions.{OhlcAggregator, Tick}
    val b0 = OhlcAggregator.zero
    // arrival order scrambled on purpose; ordering keys decide
    val ticks = Seq(
      Tick(300L, 3L, Some(5.0)),
      Tick(100L, 1L, None), // earliest row: open = NULL value
      Tick(200L, 2L, Some(9.0))
    )
    // every permutation and split must agree (merge-order determinism)
    val perms = ticks.permutations.toSeq
    val expected = {
      val r = perms.head.foldLeft(b0)(OhlcAggregator.reduce)
      OhlcAggregator.finish(r)
    }
    assert(expected.open.isEmpty, "open is the earliest row's NULL value")
    assert(expected.close == Some(5.0))
    assert(expected.high == Some(9.0) && expected.low == Some(5.0))
    assert(expected.volume == Some(14.0))
    assert(expected.n == 3L)
    perms.foreach { p =>
      assert(OhlcAggregator.finish(p.foldLeft(b0)(OhlcAggregator.reduce)) == expected)
      val (a, b) = p.splitAt(1)
      val merged = OhlcAggregator.merge(
        a.foldLeft(b0)(OhlcAggregator.reduce), b.foldLeft(b0)(OhlcAggregator.reduce))
      assert(OhlcAggregator.finish(merged) == expected)
    }
    // all-NULL values: h/l/v are NULL (SQL aggregates over all-null), n counts
    val allNull = Seq(Tick(100L, 1L, None), Tick(200L, 2L, None))
      .foldLeft(b0)(OhlcAggregator.reduce)
    val fin = OhlcAggregator.finish(allNull)
    assert(fin.high.isEmpty && fin.low.isEmpty && fin.volume.isEmpty && fin.n == 2L)
  }

  test("agg_stats: NULL prices are invisible to the histogram median, visible to count(*); all-NULL group survives") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-nullsem").toString
    // flag A: prices [1.00, 2.00, 3.00, NULL] -> median 2.00, n = 4
    // flag B: ALL prices NULL -> the group must still appear (med NULL,
    // n = 2) — its histogram is empty, so an inner med-join would drop
    // it (round-14 ADVICE item; the oracle keeps the group)
    // NULL flag: the oracle is a bare GROUP BY, so the NULL-key group
    // gets a REAL median (7.00) — requires the med joins be null-safe
    Seq(
      (Some("A"), 5.0, Some(1.00)), (Some("A"), 6.0, Some(2.00)),
      (Some("A"), 7.0, Some(3.00)), (Some("A"), 8.0, None),
      (Some("B"), 1.0, None), (Some("B"), 2.0, None),
      (None, 1.0, Some(7.00)), (None, 2.0, Some(7.00))
    ).toDF("l_returnflag", "l_quantity", "p")
      .select(col("l_returnflag"), col("l_quantity"), col("p").as("l_extendedprice"),
        lit(1L).as("l_orderkey"), lit(1L).as("l_partkey"), lit(1L).as("l_suppkey"),
        lit(1L).as("l_linenumber"), lit(0.0).as("l_discount"), lit(0.0).as("l_tax"),
        lit("O").as("l_linestatus"), lit(ts("2024-01-01 00:00:00")).as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val rows = SparkEntry.queries("agg_stats")(spark, tmp).collect()
    assert(rows.length == 3, "all-NULL-price and NULL-flag groups must not vanish")
    val a = rows.find(r => !r.isNullAt(0) && r.getString(0) == "A").get
    assert(a.getAs[Double]("med") == 2.00, "median must ignore the NULL price")
    assert(a.getAs[Long]("n") == 4L, "count(*) must include the NULL-price row")
    val b = rows.find(r => !r.isNullAt(0) && r.getString(0) == "B").get
    assert(b.isNullAt(b.fieldIndex("med")), "all-NULL group has NULL median")
    assert(b.getAs[Long]("n") == 2L)
    val nul = rows.find(_.isNullAt(0)).get
    assert(nul.getAs[Double]("med") == 7.00, "NULL-flag group gets its real median")
    assert(nul.getAs[Long]("n") == 2L)
  }

  test("ts_outlier_mad: an all-NULL-value group survives with NULL med/mad and 0 outliers") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-nullsem-mad").toString
    Seq(
      // type x: values [1.00, 2.00, 3.00] -> med 2.00, mad 1.00, 0 outliers
      (1L, ts("2024-01-01 10:00:00"), 1L, Some("x"), Some(1.00), "{}"),
      (2L, ts("2024-01-01 10:01:00"), 1L, Some("x"), Some(2.00), "{}"),
      (3L, ts("2024-01-01 10:02:00"), 1L, Some("x"), Some(3.00), "{}"),
      // type y: ALL values NULL -> group row kept, NULL med/mad, n=2,
      // n_outliers=0 (oracle's b JOIN m keeps the group; round-14 ADVICE)
      (4L, ts("2024-01-01 10:03:00"), 2L, Some("y"), None, "{}"),
      (5L, ts("2024-01-01 10:04:00"), 2L, Some("y"), None, "{}"),
      // NULL event_type: the oracle's JOIN USING(event_type) never
      // matches a NULL key, so this group is ABSENT from the output
      (6L, ts("2024-01-01 10:05:00"), 3L, None, Some(9.0), "{}")
    ).toDF("event_id", "ts", "user_id", "et", "v", "props")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("et").as("event_type"), col("v").as("value"), col("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val rows = SparkEntry.queries("ts_outlier_mad")(spark, tmp).collect()
    assert(rows.length == 2, "the all-NULL-value group must not vanish")
    val x = rows.find(_.getString(0) == "x").get
    assert(x.getAs[Double]("med_val") == 2.00 && x.getAs[Double]("mad_val") == 1.00)
    assert(x.getAs[Long]("n") == 3L && x.getAs[Long]("n_outliers") == 0L)
    val y = rows.find(_.getString(0) == "y").get
    assert(y.isNullAt(y.fieldIndex("med_val")) && y.isNullAt(y.fieldIndex("mad_val")))
    assert(y.getAs[Long]("n") == 2L && y.getAs[Long]("n_outliers") == 0L)
  }

  test("funnel_steps: a NULL-time event counts and satisfies step 1, but cannot qualify or enable a window step") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-nullsem2").toString
    Seq(
      // user 1: NULL-ts view + timed click -> the click must NOT qualify
      (1L, null.asInstanceOf[Timestamp], 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      // user 2: timed view + NULL-ts click -> the click must NOT qualify
      (3L, ts("2024-01-01 10:00:00"), 2L, "view", 1.0, "{}"),
      (4L, null.asInstanceOf[Timestamp], 2L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("funnel_steps")(spark, tmp)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, 1L)), "NULL-ts view still reaches step 1; click unqualified")
    assert(out(2L) == ((2L, 1L)), "NULL-ts click cannot complete step 2")
  }

  test("pack_shards: a NULL language is a real partition; NULL text keeps its row with NULL offset") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-nullsem3").toString
    Seq(
      (0L, "a b c", null.asInstanceOf[String], "s", 5L),
      (1L, "d e", null.asInstanceOf[String], "s", 3L),
      (2L, null.asInstanceOf[String], "en", "s", 0L),
      (3L, "f g h i", "en", "s", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("pack_shards")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(rows.size == 4, "every document keeps its row, NULL lang included")
    assert(rows(0L) == Some(0L) && rows(1L) == Some(3L),
      "the NULL-language partition accumulates its own offsets")
    assert(rows(2L).isEmpty, "NULL text has no token offset")
    assert(rows(3L) == Some(0L), "the en partition starts at 0 (null doc contributes nothing)")
  }
}
