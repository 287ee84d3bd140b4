package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape checks for every registered query at sf0.001. The real
  * correctness gate is the DuckDB oracle diff (tools/oracle_check.py,
  * driver-run at sf0.01); this spec catches compile-time/runtime rot fast.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries implementation") {
    // key-level check only — column-NAME parity between the Spark
    // result and the DuckDB oracle is verified end-to-end by the
    // driver's Verify/oracle compare (tools/oracle_check.py), which
    // hash-compares name-sorted columns; it cannot be checked
    // statically here without parsing SQL
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for (q <- SparkEntry.allQueries) {
    test(s"${q.name} runs and returns rows at sf0.001") {
      val df = SparkEntry.queries(q.name)(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("agg_corr: exact integer-moment replay matches, degenerate groups are null") {
    import spark.implicits._
    val rows = graft.Tables.events(spark, dir)
      .select(
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.hour(org.apache.spark.sql.functions.col("ts")).cast("long"),
        org.apache.spark.sql.functions
          .round(org.apache.spark.sql.functions.col("value") * 100, 0).cast("long")
      )
      .as[(String, Long, Long)].collect()
    val expect = rows.groupBy(_._1).view.mapValues { g =>
      val n = g.length.toLong
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxx = g.map(r => r._2 * r._2).sum; val syy = g.map(r => r._3 * r._3).sum
      val sxy = g.map(r => r._2 * r._3).sum
      val xs = g.map(_._2); val ys = g.map(_._3)
      if (n >= 2 && xs.max > xs.min && ys.max > ys.min) {
        val nD = n.toDouble
        val r = (nD * sxy - sx.toDouble * sy.toDouble) /
          (math.sqrt(nD * sxx - sx.toDouble * sx.toDouble) *
            math.sqrt(nD * syy - sy.toDouble * sy.toDouble))
        Some((n, BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      } else None.map(identity[(Long, Double)])
    }.toMap
    val got = SparkEntry.queries("agg_corr")(spark, dir)
      .as[(String, Long, Option[Double])].collect()
    assert(got.nonEmpty)
    got.foreach { case (et, n, corr) =>
      expect(et) match {
        case Some((en, ec)) =>
          assert(n == en && corr.contains(ec), s"$et: ($n,$corr) vs ($en,$ec)")
        case None => assert(corr.isEmpty, s"$et: expected null corr, got $corr")
      }
    }
    // correlations are real correlations: in (-1, 1), not all identical
    val vals = got.flatMap(_._3)
    assert(vals.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("funnel_steps: in-test windowed-chain replay; only one user-keyed shuffle, no join") {
    import spark.implicits._
    val W = graft.operators.TimeSeries.FunnelWindowUs
    val raw = graft.Tables.events(spark, dir)
      .select("user_id", "ts", "event_type")
      .as[(Long, java.sql.Timestamp, String)].collect()
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L
    val expect = raw
      .filter(r => Set("view", "click", "purchase")(r._3))
      .groupBy(_._1).view.mapValues { g =>
        val ev = g.map(r => (us(r._2), r._3))
        // exists-chain semantics, brute force: each consecutive gap <= W
        val s3 = ev.exists { case (tp, ep) =>
          ep == "purchase" && ev.exists { case (tc, ec) =>
            ec == "click" && tc <= tp && tp - tc <= W &&
              ev.exists { case (tv, evt) => evt == "view" && tv <= tc && tc - tv <= W }
          }
        }
        val s2 = ev.exists { case (tc, ec) =>
          ec == "click" && ev.exists { case (tv, evt) => evt == "view" && tv <= tc && tc - tv <= W }
        }
        val s1 = ev.exists(_._2 == "view")
        (g.length.toLong, if (s3) 3L else if (s2) 2L else if (s1) 1L else 0L)
      }.toMap
    val df = SparkEntry.queries("funnel_steps")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"funnel must not join:\n$plan")
    assert(
      "hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one user-keyed shuffle:\n$plan")
    val got = df.as[(Long, Long, Long)].collect()
    assert(got.nonEmpty && got.map(_._1).toSet == expect.keySet)
    got.foreach { case (u, n, steps) =>
      assert((n, steps) == expect(u), s"user $u: ($n,$steps) vs ${expect(u)}")
    }
  }

  test("ts_outlier_mad: exact median/MAD replay via histogram selection; no buffering percentile") {
    import spark.implicits._
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val rows = graft.Tables.events(spark, dir)
      .select(
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions
          .round(org.apache.spark.sql.functions.col("value") * 100, 0).cast("long")
      ).as[(String, Long)].collect()
    val expect = rows.groupBy(_._1).view.mapValues { g =>
      val cs = g.map(_._2.toDouble).toSeq
      val m = med(cs)
      val devs = cs.map(c => math.abs(c - m))
      val mad = med(devs)
      (m / 100.0, mad / 100.0, cs.length.toLong, devs.count(_ > mad * 10).toLong)
    }.toMap
    val df = SparkEntry.queries("ts_outlier_mad")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // medians must come from histogram selection, never from a
    // buffering exact-percentile agg/window — on a ~5-value key those
    // concentrate each group's full value set into one task (round-7
    // verdict watch item)
    assert(!plan.contains("percentile"), s"buffering percentile crept back:\n$plan")
    assert(plan.contains("partial_count"), s"histogram must aggregate map-side:\n$plan")
    val got = df.as[(String, Double, Double, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (et, mv, madv, n, out) =>
      assert((mv, madv, n, out) == expect(et), s"$et: ${(mv, madv, n, out)} vs ${expect(et)}")
    }
  }

  test("ts_concurrency: sweep-line replay; two-level prefix sum (broadcast bases, partial agg)") {
    import spark.implicits._
    // independent sequential replay: sessionize, emit +/-1 change
    // events, sort globally, running-sum
    val ev = graft.Tables.events(spark, dir)
      .select(
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("tsu"),
        org.apache.spark.sql.functions.col("event_id"))
      .as[(Long, Long, Long)].collect()
    val gap = 1800000000L
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (s0, e0) = (sorted.head._2, sorted.head._2)
      sorted.tail.foreach { case (_, t, _) =>
        if (t - e0 > gap) { spans += ((s0, e0)); s0 = t; e0 = t }
        else e0 = t
      }
      spans += ((s0, e0)); spans
    }
    val deltas = sessions.flatMap { case (s0, e0) => Seq((s0, 1L), ((e0 + 1), -1L)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .filter(_._2 != 0L).sortBy(_._1)
    var run = 0L
    val expect = deltas.map { case (t, dl) => run += dl; (t, dl, run) }
    val df = SparkEntry.queries("ts_concurrency")(spark, dir)
    val got = df.as[(Long, Long, Long)].collect().toSeq
    // the op keeps zero-delta change points (same-µs start+end pairs
    // cancel); the replay drops them — compare on the common support
    assert(got.filter(_._2 != 0L) == expect, "concurrency profile mismatch")
    // profile invariants: ends at zero, never negative
    assert(got.last._3 == 0L && got.forall(_._3 >= 0L))
    // two-level prefix sum: cell bases broadcast back, delta agg
    // collapses map-side; the only ordered windows run per cell / over
    // the cell-totals table
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"cell bases must broadcast:\n$plan")
    assert(plan.contains("partial_sum"), s"delta agg must be partial:\n$plan")
  }

  test("asof join semantics: latest at-or-before, left-preserving") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 12:00:00"), 1L),
      (3L, ts("2024-01-01 09:00:00"), 2L) // no click at-or-before
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (101L, 1L, ts("2024-01-01 09:00:00")),
      (102L, 1L, ts("2024-01-01 11:00:00")),
      (103L, 1L, ts("2024-01-01 12:00:00")), // equal ts → inclusive match
      (201L, 2L, ts("2024-01-01 09:30:00")) // after left row → no match
    ).toDF("click_eid", "user_id", "cts")
    val got = graft.operators.TimeSeries
      .asOfJoin(left, right, "user_id", "ts", "cts", Seq("click_eid" -> "click_id"))
      .orderBy("event_id")
      .select("event_id", "click_id")
      .as[(Long, Option[Long])]
      .collect()
      .toSeq
    assert(got == Seq((1L, Some(101L)), (2L, Some(103L)), (3L, None)))
    // with a 30-minute tolerance, the 10:00 purchase no longer matches
    // the 09:00 click; equal-ts and recent matches survive
    val tol = graft.operators.TimeSeries
      .asOfJoin(left, right, "user_id", "ts", "cts",
        Seq("click_eid" -> "click_id"), tolerance = Some("30 minutes"))
      .orderBy("event_id")
      .select("event_id", "click_id")
      .as[(Long, Option[Long])]
      .collect()
      .toSeq
    assert(tol == Seq((1L, None), (2L, Some(103L)), (3L, None)))
    // forward direction: earliest click at-or-after each purchase
    val fwd = graft.operators.TimeSeries
      .asOfJoin(left, right, "user_id", "ts", "cts",
        Seq("click_eid" -> "click_id"), forward = true)
      .orderBy("event_id")
      .select("event_id", "click_id")
      .as[(Long, Option[Long])]
      .collect()
      .toSeq
    // (1) 10:00 → next u1 click 11:00 = 102; (2) 12:00 → equal-ts 103
    // inclusive; (3) u2 09:00 → 09:30 = 201
    assert(fwd == Seq((1L, Some(102L)), (2L, Some(103L)), (3L, Some(201L))))
    // forward + tolerance: (1)'s next click is 60 min away → nulled
    val fwdTol = graft.operators.TimeSeries
      .asOfJoin(left, right, "user_id", "ts", "cts",
        Seq("click_eid" -> "click_id"), tolerance = Some("30 minutes"), forward = true)
      .orderBy("event_id")
      .select("event_id", "click_id")
      .as[(Long, Option[Long])]
      .collect()
      .toSeq
    assert(fwdTol == Seq((1L, None), (2L, Some(103L)), (3L, Some(201L))))
  }

  test("asOfJoin: boundary-timestamp ties resolve to the greatest payload tuple, both paths, both directions") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // Found by the round-16 fuzz × sf0.1 corpus: distinct right rows at
    // the SAME timestamp were ordered by neither engine — DuckDB ASOF
    // picks an arbitrary tied row and the window sort left tie order to
    // partition layout, so prior hash agreement on tied corpora was
    // luck. Pinned: greatest payload tuple (rightTs, then declared
    // payload columns) wins — here, the max click_eid among the tie.
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L), // boundary IS the tie group
      (2L, ts("2024-01-01 11:00:00"), 1L)  // tie group is strictly past
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (103L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 10:00:00")), // 3-way tie at 10:00
      (102L, 1L, ts("2024-01-01 10:00:00")),
      (90L, 1L, ts("2024-01-01 09:00:00"))
    ).toDF("click_eid", "user_id", "cts")
    for (threshold <- Seq(Long.MaxValue, 0L)) { // single-window AND hot-block paths
      val back = graft.operators.TimeSeries
        .asOfJoin(left, right, "user_id", "ts", "cts",
          Seq("click_eid" -> "click_id"), hotKeyThreshold = threshold)
        .orderBy("event_id").select("event_id", "click_id")
        .as[(Long, Option[Long])].collect().toSeq
      assert(back == Seq((1L, Some(103L)), (2L, Some(103L))),
        s"backward tie must take max payload (threshold=$threshold): $back")
      val fwd = graft.operators.TimeSeries
        .asOfJoin(left, right, "user_id", "ts", "cts",
          Seq("click_eid" -> "click_id"), forward = true, hotKeyThreshold = threshold)
        .orderBy("event_id").select("event_id", "click_id")
        .as[(Long, Option[Long])].collect().toSeq
      // (1) boundary tie at 10:00 → max 103; (2) 11:00 → nothing after
      assert(fwd == Seq((1L, Some(103L)), (2L, None)),
        s"forward tie must take max payload (threshold=$threshold): $fwd")
    }
  }

  test("asOfJoin: hot-key block path is value-identical to the single-window path") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(minutes: Long) = new java.sql.Timestamp(ts0 + minutes * 60000L)
    // deterministic pseudo-random fixture spanning ~3 days of hour
    // blocks, 3 keys + a NULL key, right rows thinning out so many
    // blocks have NO right row (exercises the spine carry), plus
    // NULL-ts left rows (match nothing on either path)
    def keyOf(i: Long): java.lang.Long =
      if (i % 7 == 3) null else java.lang.Long.valueOf(i % 3)
    val left = (0L until 400L).map { i =>
      val t: java.sql.Timestamp = if (i % 19 == 7) null else ts(i * 11 % 4321)
      (i, t, keyOf(i))
    }.toDF("event_id", "ts", "user_id")
    val right = (0L until 150L).map { i =>
      (1000L + i, ts((i * i) % 4000), keyOf(i * 5))
    }.toDF("click_eid", "cts", "user_id")
    for {
      fwd <- Seq(false, true)
      tol <- Seq(None, Some("90 minutes"))
    } {
      def run(threshold: Long) = graft.operators.TimeSeries
        .asOfJoin(left, right, "user_id", "ts", "cts",
          Seq("click_eid" -> "click_id", "cts" -> "click_ts"),
          tolerance = tol, forward = fwd, hotKeyThreshold = threshold)
        .orderBy("event_id")
        .select("event_id", "click_id", "click_ts")
        .collect()
        .map(_.toSeq)
        .toSeq
      // threshold 0: EVERY key (incl. NULL) is hot → pure block path;
      // MaxValue: classic single window. Same values or the block
      // carry is wrong.
      val hot = run(0L)
      val cold = run(Long.MaxValue)
      assert(hot == cold, s"block path diverged (forward=$fwd tolerance=$tol)")
      assert(hot.count(_(1) != null) > 50, "fixture must produce real matches")
      assert(hot.count(_(1) == null) > 10, "fixture must produce real misses")
    }
  }

  test("asOfJoin: row-atomic match, SQL-equality NULL keys, payload-less hot branch") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 12:00:00"), java.lang.Long.valueOf(1L)),
      (2L, ts("2024-01-01 12:00:00"), null.asInstanceOf[java.lang.Long])
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (java.lang.Long.valueOf(5L), java.lang.Long.valueOf(1L), ts("2024-01-01 10:00:00")),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L), ts("2024-01-01 11:59:00")),
      (java.lang.Long.valueOf(9L), null.asInstanceOf[java.lang.Long], ts("2024-01-01 11:00:00"))
    ).toDF("click_eid", "user_id", "cts")
    for (threshold <- Seq(Long.MaxValue, 0L)) {
      val got = graft.operators.TimeSeries
        .asOfJoin(left, right, "user_id", "ts", "cts",
          Seq("click_eid" -> "click_id", "cts" -> "click_ts"),
          tolerance = Some("30 minutes"), hotKeyThreshold = threshold)
        .orderBy("event_id").collect()
      // row 1: the LATEST right row (11:59, inside tolerance) is THE
      // match; its payload is NULL — per-column resolution used to
      // borrow 10:00's id=5, smuggling a 2-hour-stale value past the
      // 30-minute bound and mixing columns from two different rows
      assert(got(0).isNullAt(got(0).fieldIndex("click_id")),
        s"threshold=$threshold: stale payload leaked past tolerance")
      assert(got(0).getTimestamp(got(0).fieldIndex("click_ts")) == ts("2024-01-01 11:59:00"))
      // row 2: a NULL key never matches (SQL equality, like the
      // oracles' ASOF ... ON l.k = r.k), even with a NULL-key right row
      assert(got(1).isNullAt(got(1).fieldIndex("click_id")))
      assert(got(1).isNullAt(got(1).fieldIndex("click_ts")))
    }
    // payload-less join must plan on BOTH branches (the hot branch used
    // to throw NoSuchElementException on an empty aggregate list)
    val bare = graft.operators.TimeSeries
      .asOfJoin(left, right, "user_id", "ts", "cts", Seq.empty, hotKeyThreshold = 0L)
      .collect()
    assert(bare.length == 2)
  }
}
