package graft

import graft.sources.Store
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import java.nio.file.Files
import java.sql.Timestamp

/** Property-based checks from SURVEY.md §5.3:
  *  - append-dedup idempotence: append(x); append(x) ≡ append(x)
  *  - range-query partition invariant: q[a,b] ⊎ q(b,c] ≡ q[a,c]
  *  - schema normalization is case-insensitive in column names
  * Row counts kept small — each case drives real Spark jobs.
  */
object StoreProps extends Properties("Store") {

  // GRAFT_PROPS_N widens the per-property sample count for dedicated
  // fuzz sweeps (the lifecycle receipts in PLANS.md); the suite default
  // stays small because every case drives real Spark jobs.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(sys.env.get("GRAFT_PROPS_N").map(_.toInt).getOrElse(5))

  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def bars(n: Int, seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val t0 = java.time.LocalDate.parse("2020-01-01")
      .atStartOfDay(java.time.ZoneOffset.UTC)
    (0 until n).map { i =>
      (Timestamp.from(t0.plusDays(i).toInstant),
        rnd.nextDouble() * 100, rnd.nextDouble() * 100, rnd.nextDouble() * 100,
        rnd.nextDouble() * 100, rnd.nextInt(1000).toLong)
    }.toDF("date", "open", "high", "low", "close", "volume")
  }

  private def freshStore(): Store =
    Store.open(spark, Files.createTempDirectory("graft-prop").toString)

  private val smallN = Gen.choose(5, 25)

  property("append idempotence") = forAll(smallN, Gen.choose(1L, 999L)) { (n, seed) =>
    val s = freshStore()
    val a = bars(n, seed)
    val b = bars(n + 7, seed) // superset: same seed, longer walk prefix-equal dates
    s.write("K", a)
    s.append("K", b)
    val once = s("K").count()
    s.append("K", b)
    val twice = s("K").count()
    once == twice && once == (n + 7)
  }

  property("range partition invariant: q[a,b] ⊎ q(b,c] = q[a,c]") =
    forAll(Gen.choose(10, 30), Gen.choose(1L, 999L)) { (n, seed) =>
      val s = freshStore()
      s.write("K", bars(n, seed))
      def day(i: Int) = Timestamp.from(
        java.time.LocalDate.parse("2020-01-01").atStartOfDay(java.time.ZoneOffset.UTC)
          .plusDays(i).toInstant)
      val (a, b, c) = (day(1), day(n / 2), day(n - 1))
      val bPlus = new Timestamp(b.getTime + 1) // just past the inclusive bound
      val left = s.query("K", Some(a), Some(b)).count()
      val right = s.query("K", Some(bPlus), Some(c)).count()
      val whole = s.query("K", Some(a), Some(c)).count()
      left + right == whole
    }

  property("bucketed range query ≡ flat range query (non-aligned bounds)") =
    forAll(Gen.choose(20, 40), Gen.choose(1L, 999L), Gen.choose(0, 86399),
      Gen.choose(0, 86399)) { (n, seed, s1, s2) =>
      val data = bars(n, seed)
      val flat = freshStore()
      val bucketed = Store.open(
        spark, Files.createTempDirectory("graft-prop-b").toString,
        bucket = Some("day"))
      flat.write("K", data)
      bucketed.write("K", data)
      // bounds at arbitrary intra-day second offsets, possibly inverted
      def at(day: Int, sec: Int) = Timestamp.from(
        java.time.LocalDate.parse("2020-01-01").atStartOfDay(java.time.ZoneOffset.UTC)
          .plusDays(day).plusSeconds(sec).toInstant)
      val (a, b) = (at(2, math.min(s1, s2)), at(n - 2, math.max(s1, s2)))
      val f = flat.query("K", Some(a), Some(b))
      val g = bucketed.query("K", Some(a), Some(b))
      f.count() == g.count() && f.exceptAll(g).count() == 0
    }

  property("append idempotence with NULL-bearing rows, both paths") =
    forAll(Gen.choose(5, 20), Gen.choose(1L, 999L)) { (n, seed) =>
      // every 3rd row carries NULLs in two value columns: a null-unsafe
      // anti-join (plain = semantics) never matches those rows, so they
      // would re-append forever
      val rnd = new scala.util.Random(seed)
      val t0 = java.time.LocalDate.parse("2021-01-01")
        .atStartOfDay(java.time.ZoneOffset.UTC)
      val data = (0 until n).map { i =>
        (Timestamp.from(t0.plusDays(i).toInstant),
          rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble(),
          if (i % 3 == 0) None else Some(rnd.nextDouble()),
          if (i % 3 == 0) None else Some(rnd.nextInt(1000).toLong))
      }.toDF("date", "open", "high", "low", "close", "volume")
      val viaAppend = freshStore()
      viaAppend.write("K", data)
      viaAppend.append("K", data)
      viaAppend.append("K", data)
      val viaNewOnly = freshStore()
      viaNewOnly.write("K", data)
      viaNewOnly.appendNewOnly("K", data)
      viaNewOnly.appendNewOnly("K", data)
      viaAppend("K").count() == n && viaNewOnly("K").count() == n &&
        viaAppend("K").exceptAll(viaNewOnly("K")).count() == 0
    }

  property("concurrent appendNewOnly + compactIfNeeded + vacuum(0): no lost rows, stats intact") =
    forAll(Gen.choose(1L, 999L)) { seed => concurrentTorture(freshStore(), seed) }

  /** The same torture through RAW-OBJECT-STORE rename semantics
    * ([[ObjStoreFs]]: every directory rename is a per-object
    * copy+delete): the staged swaps and the force-vacuum's marker
    * recovery must hold up when the swap's two moves are long,
    * non-atomic multi-file windows rather than instants.
    */
  property("concurrent maintenance over copy+delete renames (objstore://): no lost rows") =
    forAll(Gen.choose(1L, 999L)) { seed =>
      spark.sparkContext.hadoopConfiguration
        .set("fs.objstore.impl", classOf[ObjStoreFs].getName)
      val dir = "objstore://" + Files.createTempDirectory("graft-prop-obj").toString
      concurrentTorture(Store.open(spark, dir), seed)
    }

  /** And on the VERSIONED layout: pointer-swap commits + vacuum's
    * orphan sweep and torn-pointer repair must never mis-read a swap
    * mid-commit (the repair path re-lists and honors in-flight ids).
    */
  property("concurrent maintenance on the versioned layout: no lost rows, pointer stays valid") =
    forAll(Gen.choose(1L, 999L)) { seed =>
      val dir = Files.createTempDirectory("graft-prop-v").toString
      concurrentTorture(Store.open(spark, dir, versioned = true), seed)
    }

  /** Bucket-granular compaction under the same torture: per-bucket
    * swaps racing appends and a force-vacuum must leave every row and
    * clear every marker, exactly like whole-item compaction does.
    */
  property("concurrent maintenance with compactBuckets (bucketed store): no lost rows") =
    forAll(Gen.choose(1L, 999L)) { seed =>
      val dir = Files.createTempDirectory("graft-prop-bc").toString
      concurrentTorture(
        Store.open(spark, dir, bucket = Some("month")), seed,
        st => { st.compactBuckets("K", maxFilesPerBucket = 1L); () })
    }

  /** 4 appender threads (distinct batches), one compaction loop, one
    * force-vacuum loop, all on ONE item: the per-item JVM locks
    * serialize the mutations and the in-flight-id registry keeps
    * vacuum(0) off live staging — end state must hold every distinct
    * row, and describe() must still see footer stats (INT96 files
    * carry none, so a non-None minIndex proves no write slipped
    * through under a racing conf/committer).
    */
  private def concurrentTorture(
      s: Store, seed: Long,
      maintainOp: Store => Unit = st => { st.compactIfNeeded("K", 2L); () }
  ): Boolean = {
      val batches = (0 until 4).map(i => bars(20, seed + i)) // distinct values per batch
      s.write("K", batches(0))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      def thread(body: => Unit): Thread = {
        val t = new Thread(() => try body catch { case e: Throwable => errs.add(e) })
        t.start(); t
      }
      val appenders = (1 until 4).map(i => thread { s.appendNewOnly("K", batches(i)) })
      val maintain = thread { while (!stop.get()) { maintainOp(s); Thread.sleep(5) } }
      val sweeper = thread { while (!stop.get()) { s.vacuum(0L); Thread.sleep(3) } }
      appenders.foreach(_.join())
      stop.set(true)
      maintain.join(); sweeper.join()
      val want = batches.reduce(_ unionByName _).dropDuplicates()
      val got = s("K")
      val stats = s.describe("K")
      val ok = errs.isEmpty &&
        got.count() == want.count() &&
        got.exceptAll(want).count() == 0 &&
        stats.minIndex.isDefined && stats.maxIndex.isDefined
      if (!ok) {
        System.err.println(s"[concurrent-prop] errs=${errs.size} got=${got.count()} " +
          s"want=${want.count()} missing=${want.exceptAll(got).count()} stats=$stats")
        errs.forEach(e => { System.err.println(s"[concurrent-prop] thread error: $e"); e.printStackTrace() })
      }
      ok
  }

  // ------------------------------------------------------------------
  // Randomized store-lifecycle fuzz (round 16): the enumerated crash
  // sweeps in ObjStoreSpec prove every LISTED crash point recovers;
  // this property searches the op-SEQUENCE space nobody enumerated. A
  // seeded generator drives a random sequence of lifecycle ops
  // (write / append / appendNewOnly / compact / compactIfNeeded /
  // compactBuckets / prune / drop / vacuum, plus deliberate
  // invalid-op probes) over the objstore:// copy+delete rename
  // semantics, arming a random ObjStoreFs crash point before each
  // renaming op with p≈1/2. A crashed op is recovered exactly the way
  // the docs prescribe (vacuum(0) then retry once) and the run then
  // continues. Invariants, checked against a sequentially-replayed
  // local model: no row lost, no duplicate incarnation (footer row
  // count == model size catches old+new mixes value-set equality
  // would miss), refusals only where documented, vacuum converges to
  // zero, staging drains.
  // ------------------------------------------------------------------

  private type BarRow = (Timestamp, Double, Double, Double, Double, Long)

  private def barRows(n: Int, seed: Long): Seq[BarRow] = {
    val rnd = new scala.util.Random(seed)
    val t0 = java.time.LocalDate.parse("2020-01-01")
      .atStartOfDay(java.time.ZoneOffset.UTC)
    (0 until n).map { i =>
      (Timestamp.from(t0.plusDays(i).toInstant),
        rnd.nextDouble() * 100, rnd.nextDouble() * 100, rnd.nextDouble() * 100,
        rnd.nextDouble() * 100, rnd.nextInt(1000).toLong)
    }
  }

  private def dayTs(i: Int): Timestamp = Timestamp.from(
    java.time.LocalDate.parse("2020-01-01")
      .atStartOfDay(java.time.ZoneOffset.UTC).plusDays(i).toInstant)

  private def isInjected(t: Throwable): Boolean = {
    var c: Throwable = t
    while (c != null) {
      if (c.isInstanceOf[ObjStoreFs.InjectedCrash]) return true
      c = if (c.getCause eq c) null else c.getCause
    }
    false
  }

  property("randomized lifecycle fuzz over objstore:// with injected crashes") =
    forAll(Gen.choose(1L, 1000000L)) { seed => lifecycleFuzz(seed) }

  private def lifecycleFuzz(seed: Long): Boolean = {
    ObjStoreFs.reset()
    spark.sparkContext.hadoopConfiguration
      .set("fs.objstore.impl", classOf[ObjStoreFs].getName)
    val rnd = new scala.util.Random(seed)
    val dir = "objstore://" + Files.createTempDirectory("graft-lfz").toString
    val s = Store.open(spark, dir, bucket = Some("day"))
    val nDays = 10
    val batches = (0 until 4).map(i => barRows(nDays, seed * 7 + i))
    def df(i: Int) = batches(i)
      .toDF("date", "open", "high", "low", "close", "volume")

    // sequential model: the row set the item must hold (date keyed as
    // epoch millis — rows are all at midnight so day-bucket prune is
    // exactly a date >= cutoff filter)
    val model = scala.collection.mutable.Set.empty[BarRow]
    var exists = false
    var fired = 0
    val log = new scala.collection.mutable.ArrayBuffer[String]

    def maybeArm(): Unit = if (rnd.nextInt(4) > 0) { // p=3/4
      // rename SOURCES only: items/K covers move-outs (incl. bucket
      // dirs, whose path contains items/K), .tmp- covers promotes;
      // afterFiles weighted low — most renamed dirs hold 1-3 files
      val target = Seq("items/K", "items/K", ".tmp-")(rnd.nextInt(3))
      val phase = if (rnd.nextBoolean()) "copy" else "delete"
      val c = ObjStoreFs.Crash(target, phase, Seq(0, 0, 1, 2)(rnd.nextInt(4)))
      ObjStoreFs.crash = Some(c)
      log += s"  armed $c"
    }

    // run op; on an injected crash, recover the documented way
    // (vacuum(0) + retry once). Returns false on an UNdocumented error.
    def run(name: String, body: () => Unit, retryOk: Throwable => Boolean): Boolean = {
      log += s"op $name (crash=${ObjStoreFs.crash.isDefined})"
      try { body(); ObjStoreFs.crash = None; true }
      catch {
        case t: Throwable if isInjected(t) =>
          fired += 1
          log += s"  crashed: ${t.getMessage}"
          s.vacuum(0L)
          try { body(); true }
          catch {
            case r: Throwable if retryOk(r) =>
              log += s"  retry refused as documented: ${r.getClass.getSimpleName}"
              true
            case r: Throwable =>
              log += s"  RETRY FAILED: $r"; false
          }
        case t: Throwable =>
          log += s"  UNDOCUMENTED ERROR: $t"; false
      }
    }

    val never = (_: Throwable) => false
    var ok = true
    val nOps = 14
    var step = 0
    while (ok && step < nOps) {
      step += 1
      if (!exists) {
        // only creation is valid; also probe that everything else
        // refuses with the documented error
        if (rnd.nextBoolean()) {
          val probe = try { s.drop("K"); "no-error" }
          catch { case e: Throwable => e.getClass.getSimpleName }
          if (probe != "ItemKeyError") { log += s"drop on absent: $probe"; ok = false }
        }
        val b = rnd.nextInt(batches.size)
        ok = ok && run(s"write($b)", () => s.write("K", df(b)), never)
        if (ok) { model.clear(); model ++= batches(b); exists = true }
      } else rnd.nextInt(10) match {
        case 0 | 1 =>
          val b = rnd.nextInt(batches.size)
          ok = run(s"appendNewOnly($b)", () => s.appendNewOnly("K", df(b)), never)
          if (ok) model ++= batches(b)
        case 2 =>
          val b = rnd.nextInt(batches.size)
          ok = run(s"append($b)", () => s.append("K", df(b)), never)
          if (ok) model ++= batches(b)
        case 3 =>
          maybeArm()
          ok = run("compact", () => s.compact("K"), never)
        case 4 =>
          maybeArm()
          ok = run("compactBuckets",
            () => { s.compactBuckets("K", maxFilesPerBucket = 1L); () }, never)
        case 5 =>
          val cut = rnd.nextInt(nDays)
          maybeArm()
          ok = run(s"prune($cut)", () => { s.prune("K", dayTs(cut)); () }, never)
          if (ok) {
            val keep = model.filter(_._1.getTime >= dayTs(cut).getTime).toSet
            model.clear(); model ++= keep
          }
        case 6 =>
          maybeArm()
          ok = run("vacuum", () => { s.vacuum(0L); () }, never)
        case 7 =>
          maybeArm()
          // a crashed drop may have completed via the recovery vacuum:
          // the retry's ItemKeyError is the documented already-gone shape
          ok = run("drop", () => s.drop("K"),
            _.isInstanceOf[graft.sources.ItemKeyError])
          if (ok) { model.clear(); exists = false }
        case 8 =>
          // documented refusal probe: write on an existing item
          val probe = try { s.write("K", df(0)); "no-error" }
          catch { case e: Throwable => e.getClass.getSimpleName }
          if (probe != "ItemExistsError") { log += s"write on existing: $probe"; ok = false }
        case 9 =>
          ok = run("compactIfNeeded",
            () => { s.compactIfNeeded("K", 2L); () }, never)
      }
      ObjStoreFs.crash = None // a point that never fired must not leak forward
    }

    // settle: recovery sweep, then convergence — a second vacuum must
    // find nothing left to do
    ok = ok && {
      s.vacuum(0L)
      val second = s.vacuum(0L)
      if (second != 0L) log += s"vacuum did not converge: second pass did $second"
      second == 0L
    }
    ok = ok && {
      val (fsH, base) = {
        val p = new org.apache.hadoop.fs.Path(dir)
        (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
      }
      val staging = new org.apache.hadoop.fs.Path(base, ".staging")
      val drained = !fsH.exists(staging) || fsH.listStatus(staging).isEmpty
      if (!drained) log += "staging not drained"
      drained
    }
    ok = ok && (if (!exists) {
      val gone = !s.exists("K")
      if (!gone) log += "item should not exist"
      gone
    } else {
      val got = s("K").collect().map(r =>
        (r.getAs[Timestamp]("DATE"), r.getAs[Double]("OPEN"),
          r.getAs[Double]("HIGH"), r.getAs[Double]("LOW"),
          r.getAs[Double]("CLOSE"), r.getAs[Long]("VOLUME"))).toSet
      val fRows = s.describe("K").rows
      val contentOk = got == model.toSet
      val countOk = fRows == model.size.toLong
      if (!contentOk) log +=
        s"content mismatch: got=${got.size} model=${model.size} " +
          s"missing=${(model.toSet -- got).take(3)} extra=${(got -- model.toSet).take(3)}"
      if (!countOk) log += s"footer rows=$fRows model=${model.size} (duplicate incarnation?)"
      contentOk && countOk
    })
    // non-vacuity receipt: one line per sequence so a test-log reader
    // can see the searched interleavings really hit crash windows
    System.err.println(
      s"[lifecycle-fuzz] seed=$seed ops=$step crashesFired=$fired " +
        s"endRows=${if (exists) model.size else -1} ok=$ok")
    if (!ok) log.foreach(l => System.err.println(s"[lifecycle-fuzz] $l"))
    ObjStoreFs.reset()
    ok
  }

  /** The same op-sequence search on the VERSIONED layout, plus the
    * CTAS staging triple (writeStagedVersion / commit / abort) on
    * fresh item names: pointer swaps replace renames here, so the
    * interesting interleavings are staged-version visibility (an
    * uncommitted version must never become visible, an aborted one
    * must vanish) racing vacuum's orphan sweep mid-sequence.
    */
  property("randomized lifecycle fuzz on the versioned layout with CTAS staging") =
    forAll(Gen.choose(1L, 1000000L)) { seed =>
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory("graft-lfzv").toString
      val s = Store.open(spark, dir, versioned = true)
      val batches = (0 until 3).map(i => barRows(8, seed * 11 + i))
      def df(i: Int) = batches(i)
        .toDF("date", "open", "high", "low", "close", "volume")
      val model = scala.collection.mutable.Map.empty[String, Set[BarRow]]
      var ctasN = 0
      var ok = true
      (0 until 12).foreach { _ =>
        if (!ok) ()
        else rnd.nextInt(8) match {
          case 0 | 1 =>
            val b = rnd.nextInt(batches.size)
            if (model.contains("K")) { s.appendNewOnly("K", df(b)); model("K") ++= batches(b).toSet }
            else { s.write("K", df(b)); model("K") = batches(b).toSet }
          case 2 =>
            if (model.contains("K")) { s.drop("K"); model.remove("K") }
          case 3 =>
            if (model.contains("K")) s.compact("K")
          case 4 =>
            s.vacuum(0L)
          case 5 | 6 =>
            // CTAS on a fresh name: commit or abort by coin flip; the
            // item must be invisible between stage and commit
            val name = s"C$ctasN"; ctasN += 1
            val b = rnd.nextInt(batches.size)
            val id = s.writeStagedVersion(name, df(b))
            if (s.exists(name)) { ok = false }
            else if (rnd.nextBoolean()) {
              s.commitStagedVersion(name, id)
              model(name) = batches(b).toSet
            } else {
              s.abortStagedVersion(name, id)
              if (s.exists(name)) ok = false
            }
          case 7 =>
            // vacuum must not sweep a registered in-flight staged id —
            // stage, vacuum, THEN commit
            val name = s"C$ctasN"; ctasN += 1
            val b = rnd.nextInt(batches.size)
            val id = s.writeStagedVersion(name, df(b))
            s.vacuum(0L)
            s.commitStagedVersion(name, id)
            model(name) = batches(b).toSet
        }
      }
      s.vacuum(0L)
      ok = ok && s.vacuum(0L) == 0L
      val result = ok && model.forall { case (k, want) =>
        val got = s(k).collect().map(r =>
          (r.getAs[Timestamp]("DATE"), r.getAs[Double]("OPEN"),
            r.getAs[Double]("HIGH"), r.getAs[Double]("LOW"),
            r.getAs[Double]("CLOSE"), r.getAs[Long]("VOLUME"))).toSet
        got == want && s.describe(k).rows == want.size.toLong
      } && s.listItems().toSet == model.keySet
      // non-vacuity receipt, mirroring the objstore lane's line
      System.err.println(
        s"[lifecycle-fuzz-versioned] seed=$seed ctas=$ctasN " +
          s"items=${model.size} ok=$result")
      result
    }

  property("normalization is case-insensitive in column names") =
    forAll(Gen.choose(5, 15), Gen.choose(1L, 999L)) { (n, seed) =>
      val s = freshStore()
      val canonical = bars(n, seed)
      val mangled = canonical.toDF(
        canonical.columns.map { c =>
          c.zipWithIndex.map { case (ch, i) =>
            if ((seed + i) % 2 == 0) ch.toUpper else ch.toLower
          }.mkString
        }.toIndexedSeq: _*
      )
      val a = s.normalize(canonical)
      val b = s.normalize(mangled)
      a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0
    }
}
