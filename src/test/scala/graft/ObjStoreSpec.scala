package graft

import graft.sources.Store
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** The control plane through RAW-OBJECT-STORE rename semantics.
  * [[ObjStoreFs]] (`objstore://` scheme) implements every directory
  * rename as a per-object copy followed by a per-object delete — what
  * `s3a://` really does — with injectable crash points. This spec
  * proves the two layers of the 100 TB object-store story:
  *
  *  - the FLAT layout's manifest-bearing marker protocol recovers
  *    EXACTLY from crashes inside a non-atomic rename (partial live
  *    dirs are restored from the complete side, interrupted drops are
  *    finished, re-created items are never clobbered);
  *  - the VERSIONED layout's write path performs ZERO control-plane
  *    renames at all — its commit primitive is the single-object
  *    pointer PUT, so none of the above hazards exist to recover from.
  */
class ObjStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.session
    s.sparkContext.hadoopConfiguration
      .set("fs.objstore.impl", classOf[ObjStoreFs].getName)
    s
  }
  import spark.implicits._

  def bars(n: Int, seed: Long = 11): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val t0 = java.time.LocalDate.parse("2020-01-01")
      .atStartOfDay(java.time.ZoneOffset.UTC)
    (0 until n).map { i =>
      (Timestamp.from(t0.plusDays(i).toInstant),
        rnd.nextDouble() * 100, 1000L + rnd.nextInt(1000))
    }.toDF("date", "price", "volume")
  }

  /** Fresh objstore:// base URI backed by a local temp dir. */
  def objDir(): String =
    "objstore://" + java.nio.file.Files.createTempDirectory("graft-obj").toString

  def hfs(p: String): (FileSystem, HPath) = {
    val hp = new HPath(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  def open(dir: String, versioned: Boolean = false): Store =
    Store.open(spark, dir,
      cols = Some(Seq(
        "price" -> org.apache.spark.sql.types.DoubleType,
        "volume" -> org.apache.spark.sql.types.LongType)),
      index = Some("date"), versioned = versioned)

  /** Control-plane renames: anything moving an immediate child of
    * items/ or .staging/ (item dirs, staged tmp/trash dirs) or a
    * version dir — as opposed to Spark committer renames, which only
    * ever move files/dirs deeper inside a single parquet output.
    */
  def ctlRenames(base: String): Seq[(String, String)] = {
    val root = new HPath(base).toUri.getPath
    def isCtl(p: String): Boolean = {
      if (!p.startsWith(root)) return false
      val segs = p.stripPrefix(root).stripPrefix("/").split("/").toSeq
      if (segs.headOption.contains(".staging")) segs.length == 2
      else if (segs.headOption.contains("items"))
        segs.length <= 2 || (segs.length == 3 && !segs(2).contains("_temporary"))
      else false
    }
    ObjStoreFs.renames.asScala.toSeq.filter { case (s, d) => isCtl(s) || isCtl(d) }
  }

  test("flat lifecycle through copy+delete renames: write/append/query/compact/describe/drop/vacuum") {
    ObjStoreFs.reset()
    val dir = objDir()
    val s = open(dir)
    s.write("MSFT", bars(100))
    assert(s("MSFT").count() == 100)
    s.appendNewOnly("MSFT", bars(150)) // 50 new rows through mode(append)
    assert(s("MSFT").count() == 150)
    s.append("MSFT", bars(150)) // full staged swap over objstore rename
    assert(s("MSFT").count() == 150)
    s.compact("MSFT") // second staged swap
    assert(s("MSFT").count() == 150)
    val q = s.query("MSFT",
      Some(Timestamp.valueOf("2020-02-01 00:00:00")),
      Some(Timestamp.valueOf("2020-02-29 00:00:00")))
    assert(q.count() == 29)
    assert(s.describe("MSFT").rows == 150)
    assert(s.vacuum(0L) == 0L, "clean swaps leave nothing to vacuum")
    s.drop("MSFT")
    assert(!s.exists("MSFT"))
    // the flat swaps really did exercise the non-atomic rename path
    assert(ctlRenames(dir).nonEmpty, "staged swaps must rename through the FS")
  }

  test("versioned lifecycle: ZERO control-plane renames — commits are pointer PUTs only") {
    ObjStoreFs.reset()
    val dir = objDir()
    val s = open(dir, versioned = true)
    s.write("MSFT", bars(100))
    s.appendNewOnly("MSFT", bars(150))
    s.append("MSFT", bars(200)) // version swap: fresh v-dir + pointer overwrite
    s.compact("MSFT") // another version swap
    assert(s("MSFT").count() == 200)
    s.drop("MSFT") // pointer delete, then data-tree delete — no rename
    assert(!s.exists("MSFT"))
    assert(ctlRenames(dir).isEmpty,
      s"versioned write path must not rename item/staging dirs: ${ctlRenames(dir)}")
  }

  test("swap crash in the MOVE-OUT's delete phase: live split in half, vacuum restores the OLD item exactly") {
    ObjStoreFs.reset()
    val dir = objDir()
    val s = open(dir)
    s.write("MSFT", bars(100))
    val before = s("MSFT").collect().map(_.toSeq).toSet
    // compact's first rename (live -> trash) dies after all files were
    // copied and ONE source file was deleted: live is a strict subset,
    // trash is complete — the crash point the rename-atomic protocol
    // could never produce
    ObjStoreFs.crash = Some(ObjStoreFs.Crash("items/MSFT", "delete", 1))
    intercept[ObjStoreFs.InjectedCrash](s.compact("MSFT"))
    // only the swap marker exists (mid never written) -> roll back;
    // the manifest says live is damaged, trash refills it per file
    assert(s.vacuum(0L) >= 1L)
    assert(s("MSFT").collect().map(_.toSeq).toSet == before,
      "old item restored byte-complete from the trash copy")
    val (fs, base) = hfs(dir)
    assert(fs.listStatus(new HPath(base, ".staging")).isEmpty)
  }

  test("swap crash in the PROMOTE's copy phase: vacuum resumes the promote, new data lands complete") {
    ObjStoreFs.reset()
    val dir = objDir()
    val s = open(dir)
    s.write("MSFT", bars(100))
    s.appendNewOnly("MSFT", bars(150)) // multiple files so the promote has >1 object
    val expected = s("MSFT").collect().map(_.toSeq).toSet
    // compact's second rename (tmp -> live) dies after copying ONE file:
    // swap+mid markers present, live partially promoted, tmp intact
    ObjStoreFs.crash = Some(ObjStoreFs.Crash(".tmp-", "copy", 1))
    intercept[ObjStoreFs.InjectedCrash](s.compact("MSFT"))
    assert(s.vacuum(0L) >= 1L)
    assert(s("MSFT").collect().map(_.toSeq).toSet == expected,
      "compacted item promoted complete despite the mid-promote crash")
    val (fs, base) = hfs(dir)
    assert(fs.listStatus(new HPath(base, ".staging")).isEmpty)
  }

  test("re-creation cannot race a crashed swap: write() refuses while markers pend, vacuum + drop clear the way") {
    ObjStoreFs.reset()
    val dir = objDir()
    val s = open(dir)
    s.write("MSFT", bars(100))
    // crash right at the promote's first copy: old data moved out
    // (swap+mid), tmp staged, live dir about to be rebuilt
    ObjStoreFs.crash = Some(ObjStoreFs.Crash(".tmp-", "copy", 0))
    intercept[ObjStoreFs.InjectedCrash](s.compact("MSFT"))
    val (fs, base) = hfs(dir)
    fs.delete(new HPath(new HPath(base, "items"), "MSFT"), true)
    // an operator re-writing the key from source CANNOT create an
    // ambiguous incarnation next to the crashed swap's markers — the
    // no-clobber guarantee of recovery rests on this refusal
    val e = intercept[Exception](s.write("MSFT", bars(30, seed = 77)))
    assert(e.getMessage.contains("vacuum"), s"unhelpful error: ${e.getMessage}")
    // the sanctioned path: recover first (the committed swap rolls
    // forward), then drop and re-create
    s.vacuum(0L)
    assert(s("MSFT").count() == 100, "crashed swap recovered whole")
    s.drop("MSFT")
    s.write("MSFT", bars(30, seed = 77))
    val fresh = s("MSFT").collect().map(_.toSeq).toSet
    s.vacuum(0L)
    assert(s("MSFT").collect().map(_.toSeq).toSet == fresh,
      "re-created item untouched by later vacuums")
    assert(fs.listStatus(new HPath(base, ".staging")).isEmpty)
  }

  test("drop retires the key's crash markers so the key is re-creatable without vacuum") {
    ObjStoreFs.reset()
    val dir = objDir()
    val s = open(dir)
    s.write("MSFT", bars(100))
    ObjStoreFs.crash = Some(ObjStoreFs.Crash("items/MSFT", "delete", 1))
    intercept[ObjStoreFs.InjectedCrash](s.compact("MSFT"))
    // the half-moved item still exists (partial live) — drop it
    s.drop("MSFT")
    assert(!s.exists("MSFT"))
    val (fs, base) = hfs(dir)
    assert(fs.listStatus(new HPath(base, ".staging")).isEmpty,
      "drop swept the crashed swap's markers and staged dirs")
    s.write("MSFT", bars(30, seed = 88)) // no refusal: markers are gone
    assert(s("MSFT").count() == 30)
  }

  test("mutating a half-moved item is refused until vacuum; recovery then restores and the append lands") {
    ObjStoreFs.reset()
    val dir = objDir()
    val s = open(dir)
    s.write("MSFT", bars(100))
    s.appendNewOnly("MSFT", bars(150)) // ≥2 data files
    val before = s("MSFT").collect().map(_.toSeq).toSet
    // die after deleting _SUCCESS and a DATA file: live is genuinely
    // missing rows, trash holds the only complete copy
    ObjStoreFs.crash = Some(ObjStoreFs.Crash("items/MSFT", "delete", 2))
    intercept[ObjStoreFs.InjectedCrash](s.compact("MSFT"))
    // a writer hitting the half-moved item is REFUSED until recovery —
    // an append here could anti-join against the partial live dir and
    // re-insert rows whose only copy sits in trash, duplicating them
    // when the restore lands
    val e = intercept[Exception](s.appendNewOnly("MSFT", bars(30, seed = 5151)))
    assert(e.getMessage.contains("vacuum"), s"unhelpful error: ${e.getMessage}")
    s.vacuum(0L)
    val extra = bars(30, seed = 5151).collect().map(_.toSeq).toSet
    s.appendNewOnly("MSFT", bars(30, seed = 5151)) // markers cleared: flows
    assert(s("MSFT").collect().map(_.toSeq).toSet == (before ++ extra),
      "old rows restored from trash, append lands after recovery")
    val (fs, base) = hfs(dir)
    assert(fs.listStatus(new HPath(base, ".staging")).isEmpty)
  }

  test("mutating a half-promoted item is refused until vacuum; recovery resumes the promote") {
    ObjStoreFs.reset()
    val dir = objDir()
    val s = open(dir)
    s.write("MSFT", bars(100))
    val committed = s("MSFT").collect().map(_.toSeq).toSet // compact preserves rows
    ObjStoreFs.crash = Some(ObjStoreFs.Crash(".tmp-", "copy", 1))
    intercept[ObjStoreFs.InjectedCrash](s.compact("MSFT"))
    // mutations are refused on the half-promoted item; compact too
    intercept[Exception](s.compact("MSFT"))
    s.vacuum(0L)
    val extra = bars(30, seed = 7272).collect().map(_.toSeq).toSet
    s.appendNewOnly("MSFT", bars(30, seed = 7272))
    assert(s("MSFT").collect().map(_.toSeq).toSet == (committed ++ extra),
      "promote resumed from tmp, append lands after recovery")
    val (fs, base) = hfs(dir)
    assert(fs.listStatus(new HPath(base, ".staging")).isEmpty)
  }

  test("drop crash in the delete phase: half-deleted item, vacuum finishes the drop") {
    ObjStoreFs.reset()
    val dir = objDir()
    val s = open(dir)
    s.write("MSFT", bars(100))
    s.appendNewOnly("MSFT", bars(150))
    ObjStoreFs.crash = Some(ObjStoreFs.Crash("items/MSFT", "delete", 1))
    intercept[ObjStoreFs.InjectedCrash](s.drop("MSFT"))
    // the item dir lost a file mid-move: neither present nor gone —
    // the del marker's intent finishes it
    assert(s.vacuum(0L) >= 1L)
    assert(!s.exists("MSFT"), "interrupted drop completes on vacuum")
    val (fs, base) = hfs(dir)
    assert(fs.listStatus(new HPath(base, ".staging")).isEmpty)
    // and the key is writable again
    s.write("MSFT", bars(10))
    assert(s("MSFT").count() == 10)
  }

  test("property: EVERY crash point in either swap rename recovers to exactly the old or the new content") {
    // enumerate crash points: phase x file-index x which-rename; after
    // vacuum the item must equal one complete side — never a mix,
    // never a partial — and staging must drain
    val points = for {
      target <- Seq("items/MSFT", ".tmp-")
      phase <- Seq("copy", "delete")
      idx <- 0 to 1
    } yield ObjStoreFs.Crash(target, phase, idx)
    points.foreach { pt =>
      ObjStoreFs.reset()
      val dir = objDir()
      val s = open(dir)
      s.write("MSFT", bars(100))
      s.appendNewOnly("MSFT", bars(150)) // ≥2 data files + _SUCCESS
      val content = s("MSFT").collect().map(_.toSeq).toSet // compact preserves rows
      ObjStoreFs.crash = Some(pt)
      try s.compact("MSFT")
      catch { case _: ObjStoreFs.InjectedCrash => () }
      // the armed point is one-shot (cleared when it fires) — a point
      // that never fired means the fixture no longer produces that
      // crash window and the recovery claim would pass vacuously
      assert(ObjStoreFs.crash.isEmpty, s"crash point $pt never fired")
      s.vacuum(0L)
      assert(s("MSFT").collect().map(_.toSeq).toSet == content,
        s"crash point $pt corrupted the item")
      // footer row count catches an old+new mixed dir (duplicated rows)
      // that value-set equality alone would miss
      assert(s.describe("MSFT").rows == 150, s"crash point $pt lost or duplicated rows")
      val (fs, base) = hfs(dir)
      assert(fs.listStatus(new HPath(base, ".staging")).isEmpty,
        s"crash point $pt left staging debris")
    }
  }

  test("prune crash mid-bucket-removal: vacuum finishes; re-running prune is a no-op") {
    ObjStoreFs.reset()
    val dir = objDir()
    val s = Store.open(spark, dir,
      cols = Some(Seq(
        "price" -> org.apache.spark.sql.types.DoubleType,
        "volume" -> org.apache.spark.sql.types.LongType)),
      index = Some("date"), bucket = Some("month"))
    s.write("MSFT", bars(100)) // Jan..Apr 2020 buckets
    val total = s("MSFT").count()
    val jan = s.query("MSFT", None,
      Some(Timestamp.valueOf("2020-01-31 23:59:59"))).count()
    ObjStoreFs.crash = Some(ObjStoreFs.Crash("__bucket=2020-01", "delete", 0))
    intercept[ObjStoreFs.InjectedCrash](
      s.prune("MSFT", Timestamp.valueOf("2020-02-01 00:00:00")))
    assert(s.vacuum(0L) >= 1L)
    assert(s("MSFT").count() == total - jan,
      "expired bucket fully gone after recovery, later buckets intact")
    // retention is re-runnable: the already-removed bucket is not seen
    assert(s.prune("MSFT", Timestamp.valueOf("2020-02-01 00:00:00")) == 0L)
    val (fs, base) = hfs(dir)
    assert(fs.listStatus(new HPath(base, ".staging")).isEmpty)
  }

  test("bucket-swap crash points (compactBuckets): vacuum recovers the ONE bucket against the marker-recorded path") {
    // both phases of both renames, like the item-swap property — but
    // the swapped dir is a single bucket, so recovery must restore or
    // promote THAT directory (recorded in the marker content) and leave
    // every sibling bucket alone
    val points = Seq(
      ObjStoreFs.Crash("__bucket=2020-01", "delete", 1), // move-out, live split
      ObjStoreFs.Crash("__bucket=2020-01", "copy", 1), // move-out, copy phase
      ObjStoreFs.Crash(".tmp-", "copy", 0), // promote never starts landing
      ObjStoreFs.Crash(".tmp-", "copy", 1) // promote half-landed
    )
    points.foreach { pt =>
      ObjStoreFs.reset()
      val dir = objDir()
      val s = Store.open(spark, dir,
        cols = Some(Seq(
          "price" -> org.apache.spark.sql.types.DoubleType,
          "volume" -> org.apache.spark.sql.types.LongType)),
        index = Some("date"), bucket = Some("month"))
      s.write("MSFT", bars(60)) // Jan-Feb 2020
      s.appendNewOnly("MSFT", bars(60, seed = 12))
      s.appendNewOnly("MSFT", bars(60, seed = 13))
      val content = s("MSFT").collect().map(_.toSeq).toSet
      val total = s.describe("MSFT").rows
      ObjStoreFs.crash = Some(pt)
      try s.compactBuckets("MSFT", maxFilesPerBucket = 1)
      catch { case _: ObjStoreFs.InjectedCrash => () }
      assert(ObjStoreFs.crash.isEmpty,
        s"bucket-swap crash point $pt never fired") // see item-swap loop
      s.vacuum(0L)
      assert(s("MSFT").collect().map(_.toSeq).toSet == content,
        s"bucket-swap crash point $pt corrupted the item")
      assert(s.describe("MSFT").rows == total,
        s"bucket-swap crash point $pt lost or duplicated rows")
      val (fs, base) = hfs(dir)
      assert(fs.listStatus(new HPath(base, ".staging")).isEmpty,
        s"bucket-swap crash point $pt left staging debris")
      // recovery leaves a consistent store: the compaction can simply
      // be re-run to completion
      s.compactBuckets("MSFT", maxFilesPerBucket = 1)
      assert(s("MSFT").collect().map(_.toSeq).toSet == content)
    }
  }

  test("LEGACY manifest-less marker + partial live: vacuum refills from trash instead of destroying the only complete copy") {
    ObjStoreFs.reset()
    val dir = objDir()
    val s = open(dir)
    s.write("MSFT", bars(100))
    s.appendNewOnly("MSFT", bars(150)) // ≥2 data files
    val before = s("MSFT").collect().map(_.toSeq).toSet
    // crash in move-out's delete phase: live is a strict subset, trash
    // holds the complete copy, only the swap marker exists (no mid)
    ObjStoreFs.crash = Some(ObjStoreFs.Crash("items/MSFT", "delete", 1))
    intercept[ObjStoreFs.InjectedCrash](s.compact("MSFT"))
    // simulate an OLD-VINTAGE marker: truncate the manifest lines so
    // parseMarker sees the manifest-less legacy format — recovery must
    // still restore the item rather than sweep the trash copy
    val (fs, base) = hfs(dir)
    val staging = new HPath(base, ".staging")
    val marker = fs.listStatus(staging)
      .map(_.getPath).find(_.getName.contains(".swap-")).get
    val firstLine = {
      val in = fs.open(marker)
      val txt = new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      in.close(); txt.split("\n").head
    }
    val out = fs.create(marker, true)
    out.write(firstLine.getBytes("UTF-8")); out.close()
    assert(s.vacuum(0L) >= 1L)
    assert(s("MSFT").collect().map(_.toSeq).toSet == before,
      "legacy roll-back restored the partially-moved live dir from trash")
    assert(s.describe("MSFT").rows == 150, "no duplicated rows either")
    assert(fs.listStatus(staging).isEmpty)
  }

  test("RELOCATED store: vacuum recovers against the current base, not the marker's recorded absolute path") {
    ObjStoreFs.reset()
    val dirA = objDir()
    val s = open(dirA)
    s.write("MSFT", bars(100))
    s.appendNewOnly("MSFT", bars(150))
    val before = s("MSFT").collect().map(_.toSeq).toSet
    // crash mid move-out: live split, trash complete, markers recording
    // dirA's ABSOLUTE paths
    ObjStoreFs.crash = Some(ObjStoreFs.Crash("items/MSFT", "delete", 1))
    intercept[ObjStoreFs.InjectedCrash](s.compact("MSFT"))
    // relocate the whole store tree — the backup-restore scenario — and
    // recover at the NEW base: the marker's recorded path must be
    // re-based, not trusted (recovering into dead dirA would strand or
    // destroy the trash copy)
    val srcRoot = java.nio.file.Paths.get(dirA.stripPrefix("objstore://"))
    val dstRoot = java.nio.file.Files.createTempDirectory("graft-obj-moved")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(srcRoot).iterator().asScala.foreach { p =>
      val t = dstRoot.resolve(srcRoot.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val moved = open("objstore://" + dstRoot.toString)
    assert(moved.vacuum(0L) >= 1L)
    assert(moved("MSFT").collect().map(_.toSeq).toSet == before,
      "item restored at the RELOCATED base")
    assert(moved.describe("MSFT").rows == 150)
    val (fs, base) = hfs("objstore://" + dstRoot.toString)
    assert(fs.listStatus(new HPath(base, ".staging")).isEmpty)
  }

  test("UNGATED-binary re-creation next to stale swap markers: vacuum never mixes the stale promote into the fresh item") {
    ObjStoreFs.reset()
    val dir = objDir()
    val s = open(dir)
    s.write("MSFT", bars(100))
    // crash mid-promote: swap+mid markers pend, tmp staged, live partial
    ObjStoreFs.crash = Some(ObjStoreFs.Crash(".tmp-", "copy", 1))
    intercept[ObjStoreFs.InjectedCrash](s.compact("MSFT"))
    // simulate a writer from a binary WITHOUT the write-refusal gate
    // re-creating the item from source while the markers still pend:
    // delete live, write a fresh incarnation straight through Spark
    val (fs, base) = hfs(dir)
    val live = new HPath(new HPath(base, "items"), "MSFT")
    fs.delete(live, true)
    val fresh = bars(30, seed = 99)
    fresh.withColumn("date", org.apache.spark.sql.functions.col("date"))
      .write.parquet(live.toString)
    val freshCount = 30L
    // vacuum must treat the foreign-named live dir as a re-created
    // incarnation: sweep the stale staging debris, touch nothing in live
    s.vacuum(0L)
    assert(spark.read.parquet(live.toString).count() == freshCount,
      "stale swap files were mixed into the re-created item")
    assert(fs.listStatus(new HPath(base, ".staging")).isEmpty,
      "stale markers and staged dirs must drain")
  }
}
