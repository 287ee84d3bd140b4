package graft

import graft.sources.Store
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The opt-in cross-JVM writer lease (`writerLease = true`): exclusive
  * create + TTL + steal-on-expiry, one lease file per item under
  * `.lease/`. The JVM-wide per-item locks already serialize writers
  * inside one driver; the lease is the other-JVM story, so these tests
  * impersonate a foreign writer by planting lease files by hand.
  */
class StoreLeaseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  def bars(n: Int, seed: Long = 31): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val t0 = java.time.LocalDate.parse("2021-01-01")
      .atStartOfDay(java.time.ZoneOffset.UTC)
    (0 until n).map { i =>
      (Timestamp.from(t0.plusDays(i).toInstant),
        rnd.nextDouble() * 100, rnd.nextDouble() * 100,
        rnd.nextDouble() * 100, rnd.nextDouble() * 100,
        1000L + rnd.nextInt(1000))
    }.toDF("date", "open", "high", "low", "close", "volume")
  }

  def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-lease").toString

  def hfs(p: String): (FileSystem, HPath) = {
    val hp = new HPath(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  def leasePath(base: HPath, key: String): HPath =
    new HPath(new HPath(base, ".lease"), key)

  test("mutations acquire and release the lease; the store works end to end with leasing on") {
    val dir = freshDir()
    val (fs, base) = hfs(dir)
    val s = Store.open(spark, dir, writerLease = true)
    s.write("MSFT", bars(100))
    s.appendNewOnly("MSFT", bars(150))
    s.compact("MSFT")
    assert(s("MSFT").count() == 150)
    // every op released its lease on the way out
    assert(!fs.exists(leasePath(base, "MSFT")))
    s.drop("MSFT")
    assert(!fs.exists(leasePath(base, "MSFT")))
  }

  test("a live foreign lease blocks writers until it expires; the failure names the remedy") {
    val dir = freshDir()
    val (fs, base) = hfs(dir)
    val s = Store.open(spark, dir, writerLease = true)
    s.write("MSFT", bars(100))
    // a foreign writer holds the lease for another hour
    Store.writeUTF8(fs, leasePath(base, "MSFT"),
      s"other-writer\n${System.currentTimeMillis() + 3600000L}")
    System.setProperty("graft.store.lease.waitMs", "300")
    try {
      val e = intercept[java.io.IOException](s.appendNewOnly("MSFT", bars(150)))
      assert(e.getMessage.contains("lease"), s"unhelpful error: ${e.getMessage}")
      assert(s("MSFT").count() == 100, "blocked writer must not have mutated")
    } finally System.clearProperty("graft.store.lease.waitMs")
    // the foreign holder's lease survived the failed contender
    assert(fs.exists(leasePath(base, "MSFT")))
  }

  test("an expired foreign lease is stolen: the op proceeds and leaves no lease behind") {
    val dir = freshDir()
    val (fs, base) = hfs(dir)
    val s = Store.open(spark, dir, writerLease = true)
    s.write("MSFT", bars(100))
    // a writer that died an hour ago
    Store.writeUTF8(fs, leasePath(base, "MSFT"),
      s"dead-writer\n${System.currentTimeMillis() - 3600000L}")
    s.appendNewOnly("MSFT", bars(150))
    assert(s("MSFT").count() == 150)
    assert(!fs.exists(leasePath(base, "MSFT")))
  }

  test("a torn lease file (no expiry line) is re-contended, not wedged") {
    val dir = freshDir()
    val (fs, base) = hfs(dir)
    val s = Store.open(spark, dir, writerLease = true)
    s.write("MSFT", bars(100))
    Store.writeUTF8(fs, leasePath(base, "MSFT"), "garbage-without-expiry")
    // unparseable = neither held nor expired: the contender polls to
    // its deadline and fails loudly rather than stealing what it cannot
    // judge or proceeding as if unguarded
    System.setProperty("graft.store.lease.waitMs", "300")
    try intercept[java.io.IOException](s.appendNewOnly("MSFT", bars(150)))
    finally System.clearProperty("graft.store.lease.waitMs")
    // operator remedy: remove the corrupt lease, writes flow again
    fs.delete(leasePath(base, "MSFT"), false)
    s.appendNewOnly("MSFT", bars(150))
    assert(s("MSFT").count() == 150)
  }

  test("the lease is RENEWED while an op outlives its ttl — ttl is a death detector, not an op bound") {
    val dir = freshDir()
    val (fs, base) = hfs(dir)
    val s = Store.open(spark, dir, writerLease = true)
    s.write("MSFT", bars(100))
    System.setProperty("graft.store.lease.ttlMs", "400")
    try {
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val opStart = System.currentTimeMillis()
      val opEnd = new java.util.concurrent.atomic.AtomicLong(0L)
      val t = new Thread(() => {
        s.compact("MSFT")
        opEnd.set(System.currentTimeMillis()); done.set(true)
      })
      t.start()
      // watch the lease file while the op runs: its expiry must move
      // forward (renewal), never lapse into stealable-expired
      val p = leasePath(base, "MSFT")
      def expiry: Option[Long] =
        try Store.readUTF8(fs, p).split("\n").lift(1).map(_.trim.toLong)
        catch { case _: Throwable => None }
      var first: Option[Long] = None
      val deadline = System.currentTimeMillis() + 10000
      while (first.isEmpty && System.currentTimeMillis() < deadline && !done.get())
        { first = expiry; Thread.sleep(20) }
      var renewed = false
      while (!renewed && System.currentTimeMillis() < deadline && !done.get()) {
        Thread.sleep(50)
        renewed = expiry.exists(e => first.exists(e > _))
      }
      t.join(30000)
      assert(done.get(), "compact must complete")
      // renewal is only REQUIRED when the op actually outlived the
      // ttl — a warm compact can finish inside 400 ms, in which case
      // there is legitimately nothing to renew (and possibly no
      // observation window at all)
      val outlived = opEnd.get() - opStart > 450
      // the lease file must have been OBSERVED during the op — a lease
      // mechanism that silently stopped creating files would otherwise
      // pass through the first.isEmpty escape hatch (and the released
      // check below would be trivially true on a never-created file).
      // Gated on a 2 s op, not the 450 ms ttl: the 20 ms-poll watcher
      // thread can be starved for one ttl under full-suite load, but
      // missing EVERY poll across 2 s of a real lease means the file
      // was genuinely never there.
      assert(first.nonEmpty || opEnd.get() - opStart <= 2000,
        s"op ran ${opEnd.get() - opStart} ms yet no lease file was ever observed at $p")
      assert(renewed || !outlived || first.isEmpty,
        s"op ran ${opEnd.get() - opStart} ms > ttl yet the lease never renewed")
      assert(!fs.exists(p), "released after the op despite renewals")
      assert(s("MSFT").count() == 100)
    } finally System.clearProperty("graft.store.lease.ttlMs")
  }

  test("leasing off (default): no lease files are ever created") {
    val dir = freshDir()
    val (fs, base) = hfs(dir)
    val s = Store.open(spark, dir)
    s.write("MSFT", bars(100))
    s.compact("MSFT")
    assert(!fs.exists(new HPath(base, ".lease")))
  }
}
