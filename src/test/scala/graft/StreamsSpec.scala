package graft

import graft.streaming.Streams
import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ops are not oracle-checkable; correctness is asserted by
  * batch-equivalence (SURVEY.md §5.4): the streamed result must equal
  * the identical computation done as a plain batch query.
  */
class StreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("stream_tumbling equals batch tumbling aggregation") {
    val streamed = Streams.tumbling(spark, dir)
    val batch = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(streamed.count() > 0)
  }

  test("stream_ohlcv equals batch hourly OHLCV bars") {
    val streamed = Streams.ohlcv(spark, dir)
    val batch = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        round(max("value"), 6).as("high"),
        round(min("value"), 6).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        round(sum("value"), 4).as("volume"),
        count(lit(1)).as("n")
      )
      .select(
        col("window.start").as("w_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("n")
      )
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(streamed.count() > 0)
  }

  test("stream_session equals batch session windows") {
    val streamed = Streams.session(spark, dir)
    val batch = Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n"), col("sum_value")
      )
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream_custom_state final totals equal batch per-user aggregates") {
    val streamed = Streams.customState(spark, dir)
      .select("user_id", "n_events", "sum_value")
    val batch = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
    // counts must match exactly; sums to float tolerance (stream order differs)
    val joined = streamed.as("s").join(batch.as("b"), "user_id")
      .select(
        (col("s.n_events") === col("b.n_events")).as("n_ok"),
        (abs(col("s.sum_value") - col("b.sum_value")) < 1e-6).as("sum_ok")
      )
    assert(streamed.count() == batch.count())
    assert(joined.filter(!col("n_ok") || !col("sum_ok")).count() == 0)
  }

  test("stream_join (watermarked interval join) equals batch interval join") {
    val streamed = Streams.streamJoin(spark, dir)
    val e = Tables.events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val batch = p.join(
      c,
      col("user_id") === col("c_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES")
    ).select("p_id", "c_id", "user_id", "p_ts", "c_ts")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream_minhash_dedup equals the batch per-bucket min-claimant computation") {
    import spark.implicits._
    import graft.functions.TextKernels
    import graft.operators.LlmOps
    val streamed = Streams.minhashDedup(spark, dir)
    // single AvailableNow batch ⇒ the first-claimant-wins streaming
    // semantic coincides with the batch per-bucket min
    val (k, rpb) = (LlmOps.ShingleK, LlmOps.RowsPerBand)
    val sigs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        TextKernels.docBandKey(t, k, rpb).map((id, _)).iterator
      }
      .toDF("doc_id", "bkey")
    val claims = sigs.groupBy("bkey").agg(min(col("doc_id")).as("claimant"))
    val batch = sigs
      .join(claims, "bkey")
      .select(
        col("doc_id"), col("bkey"),
        (col("doc_id") === col("claimant")).as("keep"),
        when(col("doc_id") =!= col("claimant"), col("claimant")).as("dup_of")
      )
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(streamed.count() > 0)
    // flagged duplicates exist in the fixture (it contains near-dups)
    assert(streamed.filter(!col("keep")).count() > 0)
  }

  test("stream_zscore is bit-identical to the batch ts_zscore window") {
    val streamed = Streams.zscore(spark, dir)
    val batch = SparkEntry.queries("ts_zscore")(spark, dir)
      .select("event_id", "user_id", "value", "n_window", "z")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(streamed.filter(col("z").isNotNull).count() > 0)
  }

  test("stream_dedup_state removes the injected duplicates exactly") {
    val streamed = Streams.dedupState(spark, dir)
    val n = Tables.events(spark, dir).count()
    assert(streamed.count() == n, "every event exactly once after doubling+dedup")
    assert(streamed.select("event_id").distinct().count() == n)
  }
}
