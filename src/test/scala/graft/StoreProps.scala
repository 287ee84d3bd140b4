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

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

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
