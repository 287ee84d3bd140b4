package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CosineSimilarity, VectorFunctions}

/** In-repo pins for the round-15 adversarial-corpus campaign
  * (graft.VerifyFuzz): the fuzz gate proved cross-engine parity on
  * zero vectors, ±0.0, malformed JSON, empty/unicode text and extreme
  * timestamps, but it runs outside `sbt test` — these fixtures pin the
  * chosen semantics so a regression fails the suite, not just the
  * external gate.
  */
class FuzzSemanticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("cosine with a zero-norm side is pinned to 0.0 (never NaN / -1), codegen and interpreted") {
    val df = Seq(
      (1L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f), Array(0.0f, 0.0f, 0.0f))
    ).toDF("id", "a", "b")
    // codegen'd expression path
    val expr = df.select(col("id"),
      CosineSimilarity.cosineSim(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(expr(1L) == 0.0, "zero vs non-zero must be 0.0, not NaN")
    assert(!expr.values.exists(_.isNaN), "no NaN may escape the kernel")
    assert(math.abs(expr(2L) - 1.0) < 1e-12)
    assert(expr(3L) == 0.0, "zero vs zero must be 0.0")
    // HOF-composed path must agree
    val hof = df.select(col("id"),
      VectorFunctions.cosineF(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hof == expr, "VectorFunctions.cosine must match the codegen kernel")
    // ragged pair with a zero-norm side: the length-mismatch NULL must
    // win over the zero-norm 0.0 pin in BOTH forms (the HOF form used
    // to hit its denom===0 guard first and return 0.0 where the native
    // expression returns NULL)
    val ragged = Seq((1L, Array(0.0f), Array(1.0f, 2.0f))).toDF("id", "a", "b")
    val rNative = ragged.select(CosineSimilarity.cosineSim(col("a"), col("b"))).collect()(0)
    val rHof = ragged.select(VectorFunctions.cosineF(col("a"), col("b"))).collect()(0)
    assert(rNative.isNullAt(0) && rHof.isNullAt(0),
      "mismatched lengths yield NULL in both forms, even with a zero-norm side")
    // a descending top-k over scores can therefore never rank a zero
    // vector above a genuinely similar one (the failure VerifyFuzz
    // exposed: IEEE 0/0=NaN sorted ABOVE every real match)
  }

  test("multimodal_framesample survives empty text and slices BYTES on unicode") {
    val work = Files.createTempDirectory("graft-fuzzframe").toString
    val uni = "héllo 你好 🚀" // 1-, 2-, 3-, 4-byte UTF-8 code points
    Seq(
      (1L, "", "en", "web", 0L),
      (2L, "a" * 300, "en", "web", 300L),
      (3L, uni, "zz", "web", uni.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$work/documents.parquet")
    // the real registered query — this THREW ("Illegal sequence
    // boundaries: 1 to 0 by 256") on any zero-length document before
    // the round-15 guard
    val out = SparkEntry.queries("multimodal_framesample")(spark, work)
      .collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(!byDoc.contains(1L), "empty text has no frames (and must not crash)")
    // 300 ASCII bytes, stride 256 → offsets 1 and 257; frame 2 is the
    // 44-byte tail
    val d2 = byDoc(2L).map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(d2 == Map(1L -> 64L, 257L -> 44L), s"got $d2")
    // unicode doc: offsets/lengths count BYTES, not chars — the UTF-8
    // encoding of the fixture is 19 bytes for 11 chars
    val uniBytes = uni.getBytes("UTF-8").length
    val d3 = byDoc(3L).map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(d3 == Map(1L -> uniBytes.toLong), s"byte-domain slicing: got $d3")
  }

  test("Spark round() collapses -0.0 to +0.0 — the normalization the oracle '+ 0.0' pins mirror") {
    // through a real double COLUMN (a bare -0.0 literal is DECIMAL)
    val bits = Seq(-0.0).toDF("v")
      .select(round(col("v"), 2).as("r"), round(col("v"), 6).as("r6"))
      .collect()(0)
    assert(java.lang.Double.doubleToRawLongBits(bits.getDouble(0)) == 0L,
      "round(-0.0) must render +0.0")
    assert(java.lang.Double.doubleToRawLongBits(bits.getDouble(1)) == 0L)
  }

  test("dropDuplicates normalizes ±0.0 in its keys: sign-twin rows collapse to one +0.0 row") {
    val df = Seq((1L, -0.0), (1L, 0.0)).toDF("id", "v")
    val out = df.dropDuplicates().collect()
    assert(out.length == 1, "-0.0 and +0.0 are the same dedup key (SPARK-24834)")
    assert(java.lang.Double.doubleToRawLongBits(out(0).getDouble(1)) == 0L,
      "the surviving representative is normalized to +0.0")
  }

  test("from_json yields NULL on malformed / empty / type-mismatched props (fn_json's dirty-data contract)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))
    // the quoted numeral is the load-bearing case: Spark's TYPED parse
    // does NOT coerce the JSON string "7" to 7, so the DuckDB oracle
    // must not either — it gates on json_type IN (BIGINT, UBIGINT)
    // before casting (a bare TRY_CAST of the string extract would
    // yield 7 and diverge). Same for a JSON double: 5.5 is not a LONG.
    val out = Seq("", "{not json!", """{"k":"你好 🚀","n":-0.0}""",
        """{"k": 49}""", """{"k":"7"}""", """{"k": 5.5}""")
      .toDF("props")
      .select(from_json(col("props"), schema).getField("k").as("k_val"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq == Seq(None, None, None, Some(49L), None, None),
      s"malformed and type-mismatched JSON must be NULL, got ${out.toSeq}")
  }

  test("resample grids stay linear under far-out timestamps (the O(n^2) window frame stays banished)") {
    // the regression shape: one pre-epoch and one 2038 event stretch a
    // series' slot grid to ~600k rows; resample_interp's forward
    // anchor must stay an incremental frame (running last over DESC),
    // not UnboundedFollowingWindowFunctionFrame. Pin by plan: no
    // "unboundedfollowing" in the executed plan of the registered query.
    val plan = SparkEntry.queries("resample_interp")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("unboundedfollowing$()"),
      "resample_interp must not plan an unbounded-following frame")
  }

  test("degenerate double moments (variance rounds to 0) yield NULL, never DIVIDE_BY_ZERO") {
    import spark.implicits._
    // cents 1e8 and 1e8+1: q = c1^2 + c2^2 loses the +1 past 2^53, so
    // n*q - s^2 rounds to EXACTLY 0 although max > min proves the true
    // variance is 0.5 - the unguarded division raised ANSI
    // DIVIDE_BY_ZERO in ts_zscore (1-hour RANGE window) and
    // ts_rolling_corr (the x-series variance term). Both now emit NULL
    // for a variance the doubles cannot resolve, on both engines.
    val work = java.nio.file.Files.createTempDirectory("graft-degen").toString
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "x", 1000000.00, "{}"),
      (2L, t("2024-01-01 11:00:00"), 1L, "x", 1000000.01, "{}"),
      (3L, t("2024-01-01 10:00:00"), 2L, "y", 1.0, "{}"),
      (4L, t("2024-01-01 11:00:00"), 2L, "y", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val zs = SparkEntry.queries("ts_zscore")(spark, work)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(zs(2L).getAs[Long]("n_window") == 2L)
    assert(zs(2L).isNullAt(zs(2L).fieldIndex("z")),
      "the degenerate z must be NULL (the true variance 0.5 is below double resolution)")
    val corr = SparkEntry.queries("ts_rolling_corr")(spark, work)
      .filter(col("n_window") === 2).collect()
    assert(corr.nonEmpty, "the (x,y) pair's second slot must have a 2-row window")
    corr.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("corr")),
        "degenerate x-variance must yield NULL corr, not a crash or +-Inf")
    }
  }

  test("domain edges cost one NULL cell, not the query: printf NULL args, log/sqrt out of domain, empty arrays") {
    import spark.implicits._
    // fn_format: SQL printf convention — a NULL argument nulls the
    // RESULT (DuckDB printf does; Spark's Formatter would print 'null')
    val work = java.nio.file.Files.createTempDirectory("graft-edge").toString
    Seq(
      (1L, "Alice", "BUILDING"),
      (2L, "Bob", null.asInstanceOf[String])
    ).toDF("c_custkey", "c_name", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$work/customer.parquet")
    val fmt = SparkEntry.queries("fn_format")(spark, work)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(fmt(1L).getString(1) == "C-0000001/BUILDING")
    assert(fmt(2L).isNullAt(1), "NULL segment must null ident, not render 'null'")
    // fn_math: a refund line (price <= -1) and a negative quantity are
    // out of ln/sqrt domain — Spark returns NULL natively but DuckDB
    // THROWS, so both sides now guard explicitly; the engine's answer
    // must be a NULL cell, never a crash
    Seq(
      (1L, 1, -2.0, 0.05, 0.02, -1.0),
      (2L, 1, 100.0, 0.05, 0.02, 4.0)
    ).toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax", "l_quantity")
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val m = SparkEntry.queries("fn_math")(spark, work)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).isNullAt(m(1L).fieldIndex("lnp")) && m(1L).isNullAt(m(1L).fieldIndex("sq")))
    assert(!m(2L).isNullAt(m(2L).fieldIndex("lnp")) && m(2L).getDouble(m(2L).fieldIndex("sq")) == 2.0)
    // fn_array: an EMPTY (not NULL) embedding — ANSI element_at threw
    // INVALID_ARRAY_INDEX; try_element_at yields NULL like DuckDB [1]
    Seq(
      (1L, Array.empty[Float], "a"),
      (2L, Array(3.0f, 4.0f), "b")
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val a = SparkEntry.queries("fn_array")(spark, work)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(a(1L).getLong(1) == 0L && a(1L).isNullAt(a(1L).fieldIndex("first_val")))
    assert(a(2L).getDouble(a(2L).fieldIndex("l2")) == 5.0)
  }

  // ---- round-16 NaN/Inf lane pins (VerifyFuzz naninf) --------------------

  test("grid boundary: non-finite doubles map to NULL, never CAST_OVERFLOW") {
    import graft.operators.Grid
    val df = Seq(
      (1L, Some(12.345)), (2L, Some(Double.NaN)),
      (3L, Some(Double.PositiveInfinity)), (4L, Some(Double.NegativeInfinity)),
      (5L, None: Option[Double]), (6L, Some(-0.0))
    ).toDF("id", "v")
    val out = df.select(col("id"), Grid.gridLong(col("v"), 100).as("c"),
      Grid.finiteD(col("v")).as("f"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 1235L) // HALF_UP on the cents grid
    Seq(2L, 3L, 4L, 5L).foreach { id =>
      assert(out(id).isNullAt(1), s"gridLong($id) must be NULL")
      assert(out(id).isNullAt(2), s"finiteD($id) must be NULL")
    }
    assert(out(6L).getLong(1) == 0L, "-0.0 is finite and on-grid")
    // the Spark-SQL fragment agrees with the Column form
    val viaSql = df.selectExpr(
      "id", Grid.finiteSparkSql("v") + " AS f").collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(2L, 3L, 4L, 5L).foreach(id => assert(viaSql(id).isNullAt(1)))
    assert(viaSql(1L).getDouble(1) == 12.345)
  }

  test("finiteVec: a vector with ANY non-finite component is a NULL vector") {
    import graft.operators.Grid
    val df = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(1.0f, Float.NaN)),
      (3L, Array(Float.PositiveInfinity, 0.0f)),
      (4L, Array(0.0f, -0.0f))
    ).toDF("id", "v")
    val out = df.select(col("id"), Grid.finiteVec(col("v")).as("fv"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).isNullAt(1) && !out(4L).isNullAt(1), "finite vectors pass through")
    assert(out(2L).isNullAt(1) && out(3L).isNullAt(1), "NaN/Inf-bearing vectors are NULL")
    // the filter form agrees (codegen'd array_max/min, no HOF)
    val kept = df.filter(Grid.isFiniteVec(col("v"))).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
    // and a -Inf-only vector is caught at the MIN end (NaN-greatest
    // ordering cannot mask it)
    val negInf = Seq((9L, Array(Float.NegativeInfinity, 1.0f))).toDF("id", "v")
    assert(negInf.filter(Grid.isFiniteVec(col("v"))).count() == 0)
    // empty-array totality: all three forms must AGREE that a
    // zero-length vector is finite (array_max([]) is NULL — an unguarded
    // predicate turns NULL and silently drops the row while finiteVec
    // and the DuckDB fragment both pass it; no corpus carries empty
    // embeddings today, and this pin keeps the three-way agreement a
    // choice rather than an accident)
    val empty = Seq((7L, Array.empty[Float])).toDF("id", "v")
    assert(empty.filter(Grid.isFiniteVec(col("v"))).count() == 1,
      "isFiniteVec must keep empty vectors")
    assert(!empty.select(Grid.finiteVec(col("v")).as("fv")).head().isNullAt(0),
      "finiteVec must pass empty vectors through")
    // NULL-element totality (r16 ADVICE): array_max/min SKIP NULL
    // elements, so only an ALL-NULL vector turns the extremes NULL —
    // before the coalesce guard isFiniteVec dropped that row while
    // finiteVec passed it through. All three forms agree now:
    // some-NULL vectors still surface NaN/±Inf via the non-NULL
    // extremes; all-NULL vectors are "not non-finite" and pass.
    val nulls = Seq(
      (10L, Array[java.lang.Float](null, null)),            // all-NULL: pass
      (11L, Array[java.lang.Float](null, 1.0f)),            // some-NULL finite: pass
      (12L, Array[java.lang.Float](null, Float.NaN)),       // NULL cannot mask NaN
      (13L, Array[java.lang.Float](null, Float.NegativeInfinity))
    ).toDF("id", "v")
    val keptN = nulls.filter(Grid.isFiniteVec(col("v"))).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(keptN == Set(10L, 11L), s"isFiniteVec NULL-element agreement: $keptN")
    val fvN = nulls.select(col("id"), Grid.finiteVec(col("v")).as("fv"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!fvN(10L) && !fvN(11L) && fvN(12L) && fvN(13L),
      "finiteVec must agree with isFiniteVec on NULL-element vectors")
  }

  test("OHLC aggregator orders doubles like Spark's builtin min/max: NaN greatest, -0.0 < +0.0") {
    // one NaN tick used to math.min-poison low/high away from both the
    // builtin path and the DuckDB oracle (found by the naninf lane)
    import graft.functions.{OhlcAggregator, Tick}
    val ticks = Seq(
      Tick(1L, 1L, Some(3.0)), Tick(2L, 2L, Some(Double.NaN)),
      Tick(3L, 3L, Some(0.0)), Tick(4L, 4L, Some(-0.0)))
    val viaReduce = ticks.foldLeft(OhlcAggregator.zero)(OhlcAggregator.reduce)
    val o1 = OhlcAggregator.finish(viaReduce)
    assert(o1.high.exists(_.isNaN), "high = NaN (NaN greatest, like builtin max)")
    assert(o1.low.exists(v => v == 0.0 && 1.0 / v < 0), "low = -0.0 (below +0.0)")
    assert(o1.open.contains(3.0) && o1.close.exists(v => v == 0.0 && 1.0 / v < 0))
    // merge order must not change the verdict (bit-compare the doubles
    // — Double == is false on NaN pairs, which is the point here)
    val (l, r) = ticks.splitAt(2)
    val merged = OhlcAggregator.merge(
      r.foldLeft(OhlcAggregator.zero)(OhlcAggregator.reduce),
      l.foldLeft(OhlcAggregator.zero)(OhlcAggregator.reduce))
    def bits(o: graft.functions.Ohlc) = (
      o.open.map(java.lang.Double.doubleToLongBits),
      o.high.map(java.lang.Double.doubleToLongBits),
      o.low.map(java.lang.Double.doubleToLongBits),
      o.close.map(java.lang.Double.doubleToLongBits),
      o.volume.map(java.lang.Double.doubleToLongBits), o.n)
    assert(bits(OhlcAggregator.finish(merged)) == bits(o1))
  }

  test("one NaN/Inf row costs one NULL cell, not the query: ts_zscore and agg_argminmax stay alive") {
    val work = Files.createTempDirectory("naninf-pin").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    Seq(
      (1L, ts(0), 7L, "view", Some(1.0), "{}"),
      (2L, ts(1), 7L, "view", Some(Double.NaN), "{}"),
      (3L, ts(2), 7L, "view", Some(2.0), "{}"),
      (4L, ts(3), 7L, "view", Some(Double.PositiveInfinity), "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val z = SparkEntry.queries("ts_zscore")(spark, work)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(z.size == 4, "all four rows survive — no CAST_OVERFLOW")
    assert(z(2L).isNullAt(z(2L).fieldIndex("z")) && z(4L).isNullAt(z(4L).fieldIndex("z")),
      "non-finite rows carry NULL z")
    assert(!z(3L).isNullAt(z(3L).fieldIndex("z")),
      "the finite row after a NaN still gets a z from the finite window members")
    Seq(
      (10L, 1, 5.0, "R"), (11L, 1, Double.NaN, "R"), (12L, 1, 3.0, "R")
    ).toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val am = SparkEntry.queries("agg_argminmax")(spark, work).collect()
    assert(am.length == 1)
    val r0 = am(0)
    assert(r0.getLong(r0.fieldIndex("top_order")) == 10L,
      "NaN price has a NULL grid key and never anchors argmax")
    assert(r0.getLong(r0.fieldIndex("bottom_order")) == 12L)
    assert(r0.getDouble(r0.fieldIndex("max_price")).isNaN,
      "raw max keeps engine NaN-greatest semantics (parity with DuckDB max)")
  }
}
