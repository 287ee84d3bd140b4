package graft

import graft.sources.{ItemExistsError, ItemKeyError, SchemaError, Store}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Ports the reference's five behavioral tests
  * (/root/reference/tests/test_store.py:35-82) against a deterministic
  * fixture — the reference downloads live MSFT bars from yfinance
  * (testing/yfinance.py:6-19), which is non-hermetic; we use a seeded
  * random walk instead. The reference's equality assertions are vacuous
  * (`(a == b).all` without parens, test_store.py:50,68); here they are
  * real checks.
  */
class StoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  /** ~1000 daily OHLCV bars from 2015-01-01, seeded random walk. */
  def bars(n: Int = 1000, seed: Long = 7, startDay: String = "2015-01-01"): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val t0 = java.time.LocalDate.parse(startDay).atStartOfDay(java.time.ZoneOffset.UTC)
    var px = 100.0
    (0 until n).map { i =>
      px = math.max(1.0, px + rnd.nextGaussian())
      val o = px; val h = px + rnd.nextDouble(); val l = px - rnd.nextDouble()
      val c = px + rnd.nextGaussian() * 0.2
      val v = 1000L + rnd.nextInt(100000)
      (Timestamp.from(t0.plusDays(i).toInstant), o, h, l, c, v)
    }.toDF("date", "open", "high", "low", "close", "volume")
  }

  def tmpDir(): String =
    Files.createTempDirectory("graft-store").toString

  test("create: store layout + schema persistence + conflict detection") {
    val dir = tmpDir()
    val s = Store.open(spark, dir)
    assert(Files.exists(java.nio.file.Paths.get(dir, "items")))
    assert(Files.exists(java.nio.file.Paths.get(dir, "schema.json")))
    assert(s.indexName == "DATE")
    assert(s.schema.fieldNames.toSeq ==
      Seq("DATE", "OPEN", "HIGH", "LOW", "CLOSE", "VOLUME"))
    // reopen with same schema: fine; with conflicting: SchemaError
    Store.open(spark, dir)
    Store.open(spark, dir, cols = Some(Store.DefaultColumns), index = Some("DATE"))
    intercept[SchemaError] {
      Store.open(spark, dir, cols = Some(Seq("X" -> DoubleType)), index = Some("TS"))
    }
  }

  test("write + read-back equality (reference test_write_data, :47-50)") {
    val dir = tmpDir()
    val s = Store.open(spark, dir)
    val df = bars(500)
    s.write("MSFT", df)
    val back = s("MSFT")
    assert(back.count() == 500)
    // full-row equality vs normalized input (order-independent)
    val want = s.normalize(df)
    assert(back.exceptAll(want).count() == 0)
    assert(want.exceptAll(back).count() == 0)
    // rewrite of an existing item is an error (store.py:203-204)
    intercept[ItemExistsError] { s.write("msft", df) } // case-folded key
  }

  test("query: inclusive range + empty-future-range (reference :53-62)") {
    val dir = tmpDir()
    val s = Store.open(spark, dir)
    s.write("MSFT", bars(400))
    val t0 = Timestamp.valueOf("2015-02-01 00:00:00")
    val t1 = Timestamp.valueOf("2015-03-01 00:00:00")
    val q = s.query("MSFT", Some(t0), Some(t1))
    val n = q.count()
    assert(n == 29, "inclusive on both ends: Feb 1 .. Mar 1 = 29 daily bars")
    val bounds = q.agg(min($"DATE"), max($"DATE")).as[(Timestamp, Timestamp)].head()
    assert(bounds._1 == t0 && bounds._2 == t1)
    // unbounded query returns everything
    assert(s.query("MSFT").count() == 400)
    // compat slice: rows dated after now() are invisible (store.py:253)
    val future = bars(10, seed = 9, startDay = "2300-01-01")
    s.append("MSFT", future)
    assert(s.query("MSFT").count() == 410)
    assert(s.sliceCompat("MSFT").count() == 400)
  }

  test("queryMany: union of pruned per-item reads, ITEM column, key folding + dedup") {
    val dir = tmpDir()
    val s = Store.open(spark, dir)
    s.write("MSFT", bars(400))
    s.write("AAPL", bars(400, seed = 7))
    val t0 = Timestamp.valueOf("2015-02-01 00:00:00")
    val t1 = Timestamp.valueOf("2015-03-01 00:00:00")
    // duplicate + lowercase keys resolve and dedupe; range applies per item
    val q = s.queryMany(Seq("msft", "AAPL", "MSFT"), Some(t0), Some(t1))
    assert(q.columns.head == "ITEM")
    val perItem = q.groupBy("ITEM").count().as[(String, Long)].collect().toMap
    assert(perItem == Map("MSFT" -> 29L, "AAPL" -> 29L))
    // rows equal the single-key reads, labeled
    val one = s.query("MSFT", Some(t0), Some(t1))
    assert(q.filter($"ITEM" === "MSFT").drop("ITEM").exceptAll(one).count() == 0)
    assert(one.exceptAll(q.filter($"ITEM" === "MSFT").drop("ITEM")).count() == 0)
    // projection flows through; empty keys and missing items fail fast
    assert(s.queryMany(Seq("MSFT"), columns = Some(Seq("date"))).columns.toSeq
      == Seq("ITEM", "DATE"))
    intercept[SchemaError] { s.queryMany(Seq.empty) }
    intercept[ItemKeyError] { s.queryMany(Seq("MSFT", "GOOG")) }
    // a stored ITEM column would silently collide with the origin column
    val s2 = Store.open(
      spark, tmpDir(),
      cols = Some(Seq("ITEM" -> org.apache.spark.sql.types.StringType)))
    intercept[SchemaError] { s2.queryMany(Seq("ANY")) }
  }

  test("append: dedup idempotence, both paths (reference :65-68)") {
    val dir = tmpDir()
    val s = Store.open(spark, dir)
    val a = bars(300)
    val b = bars(500) // superset: first 300 rows identical
    s.write("K1", a)
    s.append("K1", b)
    assert(s("K1").count() == 500)
    s.append("K1", b) // idempotent
    assert(s("K1").count() == 500)

    val s2 = Store.open(spark, tmpDir())
    s2.write("K1", a)
    s2.appendNewOnly("K1", b)
    assert(s2("K1").count() == 500)
    s2.appendNewOnly("K1", b)
    assert(s2("K1").count() == 500)
    // both paths converge to the same rows
    assert(s("K1").exceptAll(s2("K1")).count() == 0)
  }

  test("bucketed layout: directory partition pruning on range queries") {
    val dir = tmpDir()
    val s = Store.open(spark, dir, bucket = Some("month"))
    s.write("MSFT", bars(400)) // ~13 months from 2015-01-01
    assert(s("MSFT").count() == 400)
    assert(s("MSFT").columns.toSeq == s.schema.fieldNames.toSeq, "partition col hidden")
    // reopening with a conflicting bucket fails
    intercept[graft.sources.SchemaError] {
      Store.open(spark, dir, bucket = Some("day"))
    }
    // bucket layout visible on disk
    val item = java.nio.file.Paths.get(dir, "items", "MSFT")
    val parts = java.nio.file.Files.list(item).iterator()
    var sawBucketDir = false
    while (parts.hasNext) {
      if (parts.next().getFileName.toString.startsWith("__bucket=")) sawBucketDir = true
    }
    assert(sawBucketDir, "expected __bucket=... partition directories")
    // range query: correct inclusive result + PartitionFilters in plan
    val t0 = Timestamp.valueOf("2015-02-01 00:00:00")
    val t1 = Timestamp.valueOf("2015-03-01 00:00:00")
    val q = s.query("MSFT", Some(t0), Some(t1))
    assert(q.count() == 29)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__bucket"),
      s"expected partition pruning in plan:\n$plan")
    // append paths preserve the bucketed layout
    s.append("MSFT", bars(450))
    assert(s("MSFT").count() == 450)
    s.appendNewOnly("MSFT", bars(470))
    assert(s("MSFT").count() == 470)
    assert(s.query("MSFT", Some(t0), Some(t1)).count() == 29)
  }

  test("bucketed store is timezone-safe: non-UTC session correct, drifted reads correct, drifted writes fail fast") {
    val tzKey = "spark.sql.session.timeZone"
    val orig = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val dir = tmpDir()
      val s = Store.open(spark, dir, bucket = Some("day"))
      // bars timestamped at 00:00 UTC = 19:00 previous day in New York —
      // every row straddles the tz day boundary, so a UTC-formatted
      // query bound against NY-formatted bucket dirs would mis-prune
      s.write("MSFT", bars(100))
      val t0 = Timestamp.valueOf("2015-01-10 00:00:00")
      val t1 = Timestamp.valueOf("2015-02-10 00:00:00")
      val got = s.query("MSFT", Some(t0), Some(t1)).count()
      // flat store = ground truth (no bucket pruning involved)
      val flat = Store.open(spark, tmpDir())
      flat.write("MSFT", bars(100))
      assert(got == flat.query("MSFT", Some(t0), Some(t1)).count())
      assert(got == 32, "Jan 10 .. Feb 10 inclusive = 32 daily bars")
      // READS under a drifted session are CORRECT, not refused: every
      // bucket bound renders under the PERSISTED store tz and residual
      // predicates compare instants — a read-only consumer in another
      // timezone (reopen or an already-open handle after a mid-session
      // tz change) sees the same rows
      spark.conf.set(tzKey, "UTC")
      assert(s.query("MSFT", Some(t0), Some(t1)).count() == 32)
      val reopened = Store.open(spark, dir)
      assert(reopened.query("MSFT", Some(t0), Some(t1)).count() == 32)
      // WRITES are where bucket labels get rendered (date_format is
      // session-tz codegen): a drifted bucketed write refuses with the
      // remedy named, instead of silently labeling rows into wrong
      // bucket directories
      val e = intercept[SchemaError] { s.appendNewOnly("MSFT", bars(100)) }
      assert(e.getMessage.contains("timeZone"), s"unhelpful: ${e.getMessage}")
      // maintenance that only COMPARES labels stays available under
      // drift (labels render under the store tz)
      assert(s.compactBuckets("MSFT", maxFilesPerBucket = 1000L) == 0L)
    } finally spark.conf.set(tzKey, orig)
  }

  test("chunkRows caps rows per written file (reference 1M-row chunks, store.py:27)") {
    val dir = tmpDir()
    val s = Store.open(spark, dir, chunkRows = 100L)
    s.write("MSFT", bars(1000))
    assert(s("MSFT").count() == 1000)
    val files = java.nio.file.Files
      .walk(java.nio.file.Paths.get(dir, "items", "MSFT"))
      .iterator()
    var nFiles = 0
    while (files.hasNext) {
      val f = files.next()
      if (f.getFileName.toString.endsWith(".parquet")) {
        nFiles += 1
        val n = spark.read.parquet(f.toString).count()
        assert(n <= 100, s"file $f has $n rows > chunkRows=100")
      }
    }
    assert(nFiles >= 10, s"expected >= 10 capped files, saw $nFiles")
  }

  test("assignment sugar: store(k) = df writes, store.item(k) += df appends (store.py:130-139)") {
    val s = Store.open(spark, tmpDir())
    s("MSFT") = bars(300) // update desugaring = reference __setitem__
    assert(s("MSFT").count() == 300)
    intercept[ItemExistsError] { s("MSFT") = bars(300) }
    s.item("MSFT") += bars(500) // reference += idiom
    assert(s("MSFT").count() == 500)
    assert(s.item("msft").toDF.count() == 500) // lazy read, case-folded
    // item slicing mirrors store[k][t0:t1] incl. sliceCompat defaults
    assert(s.item("MSFT")(
      Timestamp.valueOf("2015-02-01 00:00:00"),
      Timestamp.valueOf("2015-03-01 00:00:00")).count() == 29)
    assert(s.item("MSFT").slice().count() == 500) // all rows predate now()
  }

  test("compact: merges small appended files back to the chunk contract, rows unchanged") {
    val dir = tmpDir()
    val s = Store.open(spark, dir, chunkRows = 1000L)
    s.write("MSFT", bars(200))
    // 8 tiny appends → small-file accumulation (the appendNewOnly trade)
    for (i <- 1 to 8)
      s.appendNewOnly("MSFT", bars(200 + i * 25))
    val before = s("MSFT")
    val beforeRows = before.collect().toSet
    def parquetFiles() = {
      val fs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "items", "MSFT"))
      try {
        import scala.jdk.CollectionConverters._
        fs.iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
      } finally fs.close()
    }
    val nBefore = parquetFiles()
    s.compact("MSFT")
    val nAfter = parquetFiles()
    assert(nAfter < nBefore, s"expected fewer files after compact ($nBefore -> $nAfter)")
    assert(s("MSFT").collect().toSet == beforeRows, "compaction must not change data")
    // still prunable + sorted: a range query behaves identically
    val t0 = Timestamp.valueOf("2015-02-01 00:00:00")
    val t1 = Timestamp.valueOf("2015-03-01 00:00:00")
    assert(s.query("MSFT", Some(t0), Some(t1)).count() == 29)
  }

  test("readStream: streaming tail-read of an item equals batch; appends arrive incrementally") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmpDir()
    val s = Store.open(spark, dir, bucket = Some("month"))
    s.write("MSFT", bars(100))
    // one shared checkpoint + file sink (memory sink cannot resume from
    // a checkpoint): the second run must process ONLY the files appended
    // since the first — a full reprocess would double-write the history
    val out = s"$dir/.stream-out"
    def runOnce(): Long = {
      val q = s.readStream("MSFT").writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", s"$dir/.chk")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.schema(s.schema).parquet(out).count()
    }
    assert(runOnce() == 100)
    // batch equality on full content
    val streamed = spark.read.schema(s.schema).parquet(out)
    assert(streamed.exceptAll(s("MSFT")).count() == 0)
    assert(s("MSFT").exceptAll(streamed).count() == 0)
    // incremental: resume adds exactly the 50-row delta (150 total)
    s.appendNewOnly("MSFT", bars(150))
    assert(runOnce() == 150)
    assert(s("MSFT").count() == 150)
  }

  test("ingestStream: micro-batches land idempotently; fresh-checkpoint replay is a no-op") {
    val dir = tmpDir()
    val s = Store.open(spark, dir, bucket = Some("month"))
    // source item feeding the stream (readStream needs an existing item)
    val src = Store.open(spark, s"$dir-src")
    src.write("FEED", bars(100))
    def ingestOnce(chk: String): Unit =
      s.ingestStream("MSFT", src.readStream("FEED"), chk).awaitTermination()
    ingestOnce(s"$dir/.chk1") // auto-creates the item on first batch
    assert(s("MSFT").count() == 100)
    assert(s("MSFT").exceptAll(src("FEED")).count() == 0)
    // resume from the SAME checkpoint after new upstream data: exactly
    // the delta is processed and appended
    src.appendNewOnly("FEED", bars(150))
    ingestOnce(s"$dir/.chk1")
    assert(s("MSFT").count() == 150)
    // replay EVERYTHING with a fresh checkpoint: every batch
    // re-delivered, every row anti-joins to nothing — no duplicates
    // (the crash-between-land-and-commit property, at full scale)
    ingestOnce(s"$dir/.chk2")
    assert(s("MSFT").count() == 150)
    assert(s("MSFT").exceptAll(src("FEED")).count() == 0)
  }

  test("describe: footer-only stats equal full-scan aggregates") {
    val dir = tmpDir()
    val s = Store.open(spark, dir, bucket = Some("month"))
    s.write("MSFT", bars(123))
    s.appendNewOnly("MSFT", bars(200)) // multiple files, incl. appended ones
    val st = s.describe("MSFT")
    val scan = s("MSFT").agg(
      count(lit(1)), min(col("DATE")), max(col("DATE"))
    ).head()
    assert(st.rows == scan.getLong(0))
    assert(st.minIndex.contains(scan.getTimestamp(1)))
    assert(st.maxIndex.contains(scan.getTimestamp(2)))
    assert(st.files > 1, "expected several parquet files after append")
    assert(st.bytes > 0)
    // an empty but existing item yields zero rows and no bounds
    val s2 = Store.open(spark, tmpDir())
    s2.write("EMPTY", bars(1).filter(lit(false)))
    val st2 = s2.describe("EMPTY")
    assert(st2.rows == 0 && st2.minIndex.isEmpty && st2.maxIndex.isEmpty)
  }

  test("compactIfNeeded: trips only past maxFiles, restores file count, rows unchanged") {
    val dir = tmpDir()
    val s = Store.open(spark, dir, bucket = Some("month"))
    s.write("MSFT", bars(100))
    // grow the item via small appends until well past the threshold
    (1 to 6).foreach(i => s.appendNewOnly("MSFT", bars(100 + i * 20)))
    val before = s.describe("MSFT")
    val rowsBefore = s("MSFT").collect().toSet
    assert(!s.compactIfNeeded("MSFT", maxFiles = before.files + 1), "under threshold: no-op")
    assert(s.describe("MSFT").files == before.files, "no-op must not touch files")
    assert(s.compactIfNeeded("MSFT", maxFiles = before.files / 2), "over threshold: compacts")
    val after = s.describe("MSFT")
    // canonical floor for a month-bucketed item: one file per bucket
    val buckets = s("MSFT").select(date_format(col("DATE"), "yyyy-MM")).distinct().count()
    assert(after.files == buckets, s"expected $buckets files (one per bucket), got ${after.files}")
    assert(after.files < before.files)
    assert(after.rows == before.rows)
    assert(s("MSFT").collect().toSet == rowsBefore, "compaction must not change data")
    // the compacted layout still answers a pruned range query correctly
    val t0 = Timestamp.valueOf("2015-02-01 00:00:00")
    val t1 = Timestamp.valueOf("2015-03-01 00:00:00")
    assert(s.query("MSFT", Some(t0), Some(t1)).count() == 29)
  }

  /** Parquet files under `itemDir` whose index column lacks INT64
    * footer statistics in ANY row group — INT96 legacy timestamps (the
    * Spark default) have none, which silently disables row-group
    * pruning and describe(); the store must never produce such a file.
    */
  def filesWithoutIndexStats(itemDir: java.nio.file.Path, idx: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new org.apache.hadoop.conf.Configuration()
    val walk = Files.walk(itemDir)
    try walk.iterator().asScala
      .filter(f => f.toString.endsWith(".parquet") && Files.isRegularFile(f))
      .filterNot { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.toString), conf))
        try r.getFooter.getBlocks.asScala.forall { b =>
          b.getColumns.asScala
            .find(_.getPath.toDotString.equalsIgnoreCase(idx))
            .exists { c =>
              val st = c.getStatistics
              st != null && !st.isEmpty && st.hasNonNullValue &&
                st.genericGetMin.isInstanceOf[java.lang.Long]
            }
        } finally r.close()
      }
      .map(_.toString).toVector
    finally walk.close()
  }

  test("micros pin: resident ingestStream racing batch writes — every file keeps INT64 index stats") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmpDir()
    val s = Store.open(spark, dir, bucket = Some("month"))
    val src = Store.open(spark, s"$dir-src")
    src.write("FEED", bars(100))
    // resident stream (NOT AvailableNow): its micro-batch writes on the
    // stream thread interleave with this thread's batch writes — the
    // exact schedule the old per-write set/restore conf swap raced
    // (restore on one thread mid-write on the other => INT96 files)
    val q = s.ingestStream(
      "STREAMED", src.readStream("FEED"), s"$dir/.chk",
      Trigger.ProcessingTime("25 milliseconds"))
    try {
      s.write("BATCHED", bars(50))
      (1 to 5).foreach { i =>
        src.appendNewOnly("FEED", bars(100 + i * 15))
        s.appendNewOnly("BATCHED", bars(50 + i * 10))
      }
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination() }
    assert(s("STREAMED").count() == 175)
    assert(s("BATCHED").count() == 100)
    // the invariant the race used to break: NO file anywhere in either
    // item is missing INT64 stats on the index column
    val itemsRoot = java.nio.file.Paths.get(dir, "items")
    assert(filesWithoutIndexStats(itemsRoot, "DATE").isEmpty,
      s"files without INT64 index stats: ${filesWithoutIndexStats(itemsRoot, "DATE")}")
    // and the per-write guard: a mid-session conf change fails fast
    // instead of landing stat-less INT96 files
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try intercept[SchemaError] { s.appendNewOnly("BATCHED", bars(120)) }
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // reopening any store re-pins the invariant
    Store.open(spark, dir, bucket = Some("month"))
    s.appendNewOnly("BATCHED", bars(120))
    assert(s("BATCHED").count() == 120)
    assert(filesWithoutIndexStats(itemsRoot, "DATE").isEmpty)
  }

  test("prune: drops whole expired buckets, keeps the cutoff's own bucket, no scan") {
    val dir = tmpDir()
    val s = Store.open(spark, dir, bucket = Some("day"))
    s.write("MSFT", bars(90)) // ~Jan-Apr 2015, one bucket per day
    val total = s("MSFT").count()
    val cutoff = Timestamp.valueOf("2015-02-10 12:00:00") // mid-bucket
    val expected = s.query("MSFT", Some(Timestamp.valueOf("2015-02-10 00:00:00")), None).count()
    val dropped = s.prune("MSFT", cutoff)
    assert(dropped > 0)
    // bucket-granular: everything from the cutoff's own bucket onward kept
    assert(s("MSFT").count() == expected)
    assert(s("MSFT").agg(min(col("DATE"))).head().getTimestamp(0)
      .compareTo(Timestamp.valueOf("2015-02-10 00:00:00")) >= 0)
    // idempotent: nothing else to drop at the same cutoff
    assert(s.prune("MSFT", cutoff) == 0)
    assert(s("MSFT").count() == expected && expected < total)
    // flat stores reject prune (no sub-scan deletion unit)
    val flat = Store.open(spark, tmpDir())
    flat.write("X", bars(5))
    intercept[SchemaError] { flat.prune("X", cutoff) }
  }

  test("query projection: pruned columns reach the parquet ReadSchema") {
    val dir = tmpDir()
    val s = Store.open(spark, dir)
    s.write("MSFT", bars())
    val q = s.query(
      "MSFT",
      Some(Timestamp.valueOf("2015-02-01 00:00:00")),
      Some(Timestamp.valueOf("2015-03-01 00:00:00")),
      columns = Some(Seq("close", "Volume")) // case-insensitive
    )
    assert(q.columns.toSeq == Seq("CLOSE", "VOLUME"))
    assert(q.count() == 29) // inclusive bounds
    // the scan must decode only the index (for the residual range
    // filter) and the two requested columns — never the full width
    val scan = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    val readSchema = "ReadSchema: ([^\\n]*)".r
      .findFirstMatchIn(scan).map(_.group(1)).getOrElse(scan)
    assert(readSchema.contains("CLOSE") && readSchema.contains("VOLUME"))
    assert(!readSchema.contains("OPEN") && !readSchema.contains("HIGH") && !readSchema.contains("LOW"),
      s"unpruned scan: $readSchema")
    // unknown column fails fast
    intercept[SchemaError](s.query("MSFT", None, None, Some(Seq("nope"))))
  }

  test("drop removes one item, leaves the store and other items intact") {
    val dir = tmpDir()
    val s = Store.open(spark, dir)
    s.write("AAA", bars(100))
    s.write("BBB", bars(100))
    s.drop("AAA")
    assert(!s.exists("AAA") && s.exists("BBB"))
    assert(s.listItems() == Seq("BBB"))
    assert(s("BBB").count() == 100)
    intercept[ItemKeyError](s.drop("AAA")) // already gone
    // the key is reusable after a drop
    s.write("AAA", bars(50))
    assert(s("AAA").count() == 50)
  }

  test("vacuum: sweeps crash-orphaned .staging dirs, items untouched") {
    val dir = tmpDir()
    val s = Store.open(spark, dir)
    s.write("AAA", bars(200))
    // simulate a kill between stagedOverwrite's atomic swap and the
    // final delete: orphaned tmp- and old- dirs (with content) linger
    val staging = java.nio.file.Paths.get(dir, ".staging")
    Files.createDirectories(staging)
    for (n <- Seq("AAA.tmp-dead-beef", "AAA.old-cafe-f00d")) {
      val d = staging.resolve(n)
      Files.createDirectories(d)
      Files.write(d.resolve("part-orphan.parquet"), Array[Byte](1, 2, 3))
    }
    // reopen (crash-recovery shape): the DEFAULT vacuum is age-guarded
    // (1h) so just-written staging dirs — indistinguishable from a
    // concurrent writer mid-op — survive; force-sweep takes 0
    val reopened = Store.open(spark, dir)
    assert(reopened.vacuum() == 0L, "default vacuum must not sweep fresh staging dirs")
    assert(reopened.vacuum(olderThanMillis = 0L) == 2L)
    val left = { val l = Files.list(staging); try l.count() finally l.close() }
    assert(left == 0L, ".staging must be empty after vacuum")
    assert(reopened("AAA").count() == 200, "live item must be untouched")
    // age guard: a fresh orphan survives a vacuum scoped to older dirs
    val fresh = staging.resolve("AAA.tmp-in-flight")
    Files.createDirectories(fresh)
    assert(reopened.vacuum(olderThanMillis = 60000L) == 0L)
    assert(Files.exists(fresh), "in-flight staging dir must survive an age-scoped vacuum")
    assert(reopened.vacuum(olderThanMillis = 0L) == 1L)
    // no staging dir at all: no-op
    val bare = Store.open(spark, tmpDir())
    assert(bare.vacuum() == 0L)
  }

  test("key validation (reference :71-82)") {
    val s = Store.open(spark, tmpDir())
    for (bad <- Seq("", "a b", "a/b", "a$b", "ключ", "a\nb", "a:b"))
      intercept[ItemKeyError] { s.validateKey(bad) }
    assert(s.validateKey("msft-2.b_x") == "MSFT-2.B_X")
    intercept[ItemKeyError] { s("NOPE") }
  }

  test("normalize: case-insensitive match, extra cols dropped, real cast, missing col error") {
    val s = Store.open(spark, tmpDir())
    val df = Seq(
      ("2020-01-01 00:00:00", 1, 2, 0, 1, "5", "junk")
    ).toDF("Date", "oPen", "HIGH", "low", "close", "volume", "extra")
      .withColumn("Date", $"Date".cast(TimestampType))
    val out = s.normalize(df)
    assert(out.columns.toSeq == Seq("DATE", "OPEN", "HIGH", "LOW", "CLOSE", "VOLUME"))
    assert(out.schema("OPEN").dataType == DoubleType) // int really cast (store.py:168 bug fixed)
    assert(out.schema("VOLUME").dataType == LongType) // string "5" cast to long
    assert(out.as[(Timestamp, Double, Double, Double, Double, Long)].head()._6 == 5L)
    intercept[SchemaError] { s.normalize(df.drop("close")) }
  }

  test("compactBuckets: rewrites only oversized buckets, cold buckets byte-untouched") {
    val dir = tmpDir()
    val s = Store.open(spark, dir, bucket = Some("month"))
    // three appends landing in Jan-Feb 2015 pile small files into those
    // buckets; a fourth, disjoint append makes a single-file cold bucket
    s.write("MSFT", bars(40)) // Jan 1 .. Feb 9
    s.appendNewOnly("MSFT", bars(40, seed = 8))
    s.appendNewOnly("MSFT", bars(40, seed = 9))
    s.appendNewOnly("MSFT", bars(10, startDay = "2015-06-01")) // cold bucket
    val before = s("MSFT").collect().map(_.toSeq).toSet
    val items = java.nio.file.Paths.get(dir, "items", "MSFT")
    import scala.jdk.CollectionConverters._
    def filesIn(bucket: String): Set[String] = {
      val d = items.resolve(s"__bucket=$bucket")
      val st = java.nio.file.Files.list(d)
      try st.iterator().asScala.map(_.getFileName.toString)
        .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
      finally st.close()
    }
    val coldBefore = filesIn("2015-06")
    val janBefore = filesIn("2015-01").size
    assert(janBefore > 2, s"fixture must pile files in Jan (got $janBefore)")
    val rewritten = s.compactBuckets("MSFT", maxFilesPerBucket = 2)
    assert(rewritten >= 1, "at least the Jan bucket must trip the threshold")
    assert(filesIn("2015-01").size < janBefore, "oversized bucket rewritten smaller")
    assert(filesIn("2015-06") == coldBefore, "cold bucket files untouched (same names)")
    assert(s("MSFT").collect().map(_.toSeq).toSet == before, "rows preserved exactly")
    assert(s.describe("MSFT").rows == before.size, "no duplicated rows")
    // threshold satisfied now: a second pass is a metadata-only no-op
    assert(s.compactBuckets("MSFT", maxFilesPerBucket = 2) == 0L)
    // the since bound skips older buckets entirely: pile files into Jan
    // again, then compact only from June — Jan must stay oversized
    s.appendNewOnly("MSFT", bars(40, seed = 21))
    s.appendNewOnly("MSFT", bars(40, seed = 22))
    val janPiled = filesIn("2015-01").size
    assert(janPiled > 2)
    assert(s.compactBuckets("MSFT", maxFilesPerBucket = 2,
      since = Some(Timestamp.valueOf("2015-06-01 00:00:00"))) == 0L)
    assert(filesIn("2015-01").size == janPiled, "pre-cutoff bucket untouched")
    assert(s.compactBuckets("MSFT", maxFilesPerBucket = 2) >= 1L)
    // non-bucketed stores have no sub-item rewrite unit
    val flat = Store.open(spark, tmpDir())
    flat.write("MSFT", bars(10))
    intercept[SchemaError] { flat.compactBuckets("MSFT") }
  }

  test("pending recovery markers gate every mutation; drop retires them; markerless orphans do not block") {
    import graft.sources.PendingRecoveryError
    import org.apache.hadoop.fs.{Path => HPath}
    val dir = tmpDir()
    val s = Store.open(spark, dir, bucket = Some("month"))
    s.write("MSFT", bars(100))
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new HPath(dir, ".staging")
    fs.mkdirs(staging)
    // a crashed writer's swap marker (the exact state an interrupted
    // stagedSwapFlat leaves): every mutation path must refuse with the
    // distinct PendingRecoveryError naming the remedy
    Store.writeUTF8(fs, new HPath(staging, "MSFT.swap-dead"), s"$dir/items/MSFT")
    val e = intercept[PendingRecoveryError] { s.append("MSFT", bars(10)) }
    assert(e.getMessage.contains("vacuum"), s"remedy not named: ${e.getMessage}")
    intercept[PendingRecoveryError] { s.appendNewOnly("MSFT", bars(10)) }
    intercept[PendingRecoveryError] { s.compact("MSFT") }
    intercept[PendingRecoveryError] { s.compactBuckets("MSFT") }
    intercept[PendingRecoveryError] {
      s.prune("MSFT", Timestamp.valueOf("2015-03-01 00:00:00"))
    }
    assert(s("MSFT").count() == 100, "reads flow while mutations are gated")
    // write()'s re-creation refusal: markers pending for an ABSENT key
    // block creating it (recovery's no-clobber guarantee rests on this)
    Store.writeUTF8(fs, new HPath(staging, "GONE.del-dead"), s"$dir/items/GONE")
    intercept[PendingRecoveryError] { s.write("GONE", bars(10)) }
    // drop() retires the markers with the item: re-creation succeeds
    s.drop("MSFT")
    assert(!fs.exists(new HPath(staging, "MSFT.swap-dead")), "drop must sweep markers")
    s.write("MSFT", bars(50))
    assert(s("MSFT").count() == 50)
    // markerless .tmp-/.old- orphans are debris, NOT half-moved state
    // (the swap marker exists before the first rename): they must not
    // wedge writers — vacuum's age sweep owns them
    fs.mkdirs(new HPath(staging, "MSFT.tmp-orphan"))
    fs.mkdirs(new HPath(staging, "MSFT.old-orphan"))
    s.appendNewOnly("MSFT", bars(60))
    assert(s("MSFT").count() == 60)
    // a marker for key "MSFT.X" must not gate key "MSFT" (dots are
    // legal in keys; the match is exact, not prefix)
    Store.writeUTF8(fs, new HPath(staging, "MSFT.X.swap-dead"), s"$dir/items/MSFT.X")
    s.compact("MSFT")
    assert(s("MSFT").count() == 60)
  }

  test("a transient job failure inside a staged swap cleans up after itself — no vacuum needed") {
    val dir = tmpDir()
    val s = Store.open(spark, dir)
    s.write("MSFT", bars(100))
    // a batch that fails at ACTION time (inside stagedSwapFlat's
    // writeTmp), like an executor OOM or a flaky object store would:
    // assert_true throws mid-job, after the swap marker may exist
    val poison = bars(50, seed = 99)
      .withColumn("open", expr("assert_true(open > 1e18)").cast("double"))
    intercept[Exception] { s.append("MSFT", poison) }
    // the failed op retired its own staging debris: the very next
    // mutation runs WITHOUT any vacuum() in between
    s.append("MSFT", bars(150))
    assert(s("MSFT").count() == 150)
    val staging = new java.io.File(dir, ".staging")
    val leftovers = Option(staging.list()).fold(Seq.empty[String])(_.toSeq)
      .filter(n => n.contains(".swap-") || n.contains(".mid-") || n.contains(".del-"))
    assert(leftovers.isEmpty, s"recovery markers left behind: $leftovers")
  }

  test("listing walk never enters hidden dirs: in-flight _temporary payload invisible to ALL metadata") {
    // Found by the widened 25-seed concurrent-torture sweep: a
    // maintenance thread's describe() died walking a concurrent
    // appender's `_temporary/` task dir that vanished between the
    // parent listing and the descent (RawLocalFileSystem surfaces that
    // as an opaque IOException no message-matching retry can own).
    // Every walkFiles caller filters hidden segments anyway, so the
    // walk must never ENTER a hidden directory — which also closes the
    // one caller whose own filter was name-only: versions() counted an
    // in-flight committer's `_temporary/**.parquet` payload into a
    // version's files/bytes. Pin that observable here; the race itself
    // is covered by the widened StoreProps torture sweep.
    val dir = tmpDir()
    val s = Store.open(spark, dir, versioned = true)
    s.write("MSFT", bars(10))
    val cur = s.versionsOf("MSFT").find(_.current).get
    val vDir = java.nio.file.Paths.get(dir, "items", "MSFT", cur.id)
    val tmpTask = vDir.resolve("_temporary").resolve("0").resolve("task-0")
    java.nio.file.Files.createDirectories(tmpTask)
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(vDir)
    val firstParquet =
      try walk.iterator().asScala.filter(_.toString.endsWith(".parquet")).next()
      finally walk.close()
    java.nio.file.Files.copy(
      firstParquet, tmpTask.resolve("part-00000-inflight.snappy.parquet"))
    val after = s.versionsOf("MSFT").find(_.current).get
    assert(after.files == cur.files,
      s"in-flight _temporary payload leaked into version file count: $cur -> $after")
    assert(after.bytes == cur.bytes,
      s"in-flight _temporary payload leaked into version bytes: $cur -> $after")
    assert(s.describe("MSFT").rows == 10)
    assert(s("MSFT").count() == 10, "scan must exclude the hidden subtree")
  }

  test("vacuum job 4 on the flat layout: dead committer staging inside the item dir is swept") {
    // flat-layout twin of StoreVersionedSpec's job-4 test: the in-place
    // append's committer staging lands directly under items/KEY here
    val dir = tmpDir()
    val s = Store.open(spark, dir)
    s.write("IBM", bars(20))
    val before = s("IBM").collect().map(_.toSeq).toSet
    val itemDir = java.nio.file.Paths.get(dir, "items", "IBM")
    val staging = itemDir.resolve(".spark-staging-dead-uuid")
    java.nio.file.Files.createDirectories(staging)
    java.nio.file.Files.write(staging.resolve("part-00000-dead.snappy.parquet"),
      Array[Byte](9, 9, 9))
    assert(s.vacuum() == 0L, "fresh debris survives the aged sweep")
    assert(s.vacuum(0L) == 1L, "force sweep reclaims the dead staging dir")
    assert(!java.nio.file.Files.exists(staging))
    assert(s("IBM").collect().map(_.toSeq).toSet == before, "data untouched")
    assert(s.vacuum(0L) == 0L, "sweep converges")
  }
}
