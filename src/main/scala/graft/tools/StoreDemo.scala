package graft.tools

import graft.sources.{ItemKeyError, SchemaError, Store}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Example/demo driver for the Store API: ingests the `events` table from
  * a testdata dir into a fresh store, then exercises range query, append
  * idempotence, and the error surface. Run:
  *   sbt "runMain graft.tools.StoreDemo /root/testdata/sf0.001 /tmp/storedemo"
  */
object StoreDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, baseDir) = args.take(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet ts vintage handling (nanos or micros) — graft.Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // native SQL functions + the footer-aggregate optimizer rule
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val store = Store.open(
      spark, baseDir,
      cols = Some(Seq(
        "EVENT_ID" -> LongType, "USER_ID" -> LongType,
        "EVENT_TYPE" -> StringType, "VALUE" -> DoubleType)),
      index = Some("TS"),
      bucket = Some("day")) // directory partitioning: __bucket=yyyy-MM-dd/
    println(s"[demo] schema: ${store.schema.catalogString}")

    import org.apache.spark.sql.functions.col
    val events = graft.Tables.events(spark, sfDir)
    if (!store.exists("events")) store.write("events", events)
    println(s"[demo] total rows: ${store("EVENTS").count()}")
    val st = store.describe("EVENTS")
    println(
      s"[demo] describe (footer-only, no scan): rows=${st.rows} " +
        s"range=[${st.minIndex.orNull}, ${st.maxIndex.orNull}] " +
        s"files=${st.files} bytes=${st.bytes}")

    val t0 = Timestamp.valueOf("2024-01-10 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-20 00:00:00")
    val ranged = store.query("events", Some(t0), Some(t1))
    println(s"[demo] rows in [$t0, $t1]: ${ranged.count()}")
    import org.apache.spark.sql.functions._
    ranged.agg(min(col("TS")), max(col("TS"))).show(false)
    ranged.explain("formatted")

    store.append("events", events)
    println(s"[demo] after re-append (idempotent): ${store("events").count()}")
    store.appendNewOnly("events", events)
    println(s"[demo] after appendNewOnly same batch: ${store("events").count()}")

    // maintenance policy: compact only when small appended files pile up
    val f0 = store.describe("EVENTS").files
    val ran = store.compactIfNeeded("events", maxFiles = f0) // at threshold: no-op
    val ran2 = store.compactIfNeeded("events", maxFiles = math.max(1, f0 / 2))
    println(
      s"[demo] compactIfNeeded: files=$f0 -> noop@maxFiles=$f0 (ran=$ran), " +
        s"compacted@maxFiles=${math.max(1, f0 / 2)} (ran=$ran2, files now " +
        s"${store.describe("EVENTS").files}, rows ${store("events").count()})")
    // the 100 TB-shape maintenance op: rewrite only OVERSIZED buckets
    // (O(append-rate), not O(history)); on this freshly-compacted
    // day-bucketed store every bucket is already one file, so it's a
    // metadata-only no-op
    val bRewritten = store.compactBuckets("events", maxFilesPerBucket = 4)
    println(
      s"[demo] compactBuckets: $bRewritten oversized buckets rewritten " +
        s"(threshold 4 files/bucket; rows ${store("events").count()})")

    try store.write("bad key!", events)
    catch { case e: ItemKeyError => println(s"[demo] bad key rejected: ${e.getMessage}") }
    try Store.open(spark, baseDir, cols = Some(Seq("X" -> DoubleType)), index = Some("D"))
    catch { case e: SchemaError => println(s"[demo] schema conflict rejected: ${e.getMessage}") }

    // versioned layout: same API, rename-free pointer-swap commits
    // (object-store-native); compaction lands in a fresh v-<id> dir
    // committed by one _current overwrite
    val vstore = Store.open(
      spark, baseDir + "-versioned",
      cols = Some(Seq(
        "EVENT_ID" -> LongType, "USER_ID" -> LongType,
        "EVENT_TYPE" -> StringType, "VALUE" -> DoubleType)),
      index = Some("TS"), versioned = true)
    if (!vstore.exists("events")) vstore.write("events", events)
    vstore.appendNewOnly("events", events) // idempotent, stays in-version
    vstore.compact("events") // pointer swap: new version, old deleted
    println(
      s"[demo] versioned store: rows=${vstore("events").count()} " +
        s"files=${vstore.describe("events").files} " +
        s"(compact committed by _current pointer swap; vacuum sweeps " +
        s"${vstore.vacuum(0L)} orphans on a clean store)")

    // SQL front door (DataSource V2): the item as a table, with
    // index-range predicates pruned to bucket dirs exactly like
    // store.query, and INSERT INTO carrying the += append contract
    spark.sql("DROP TABLE IF EXISTS demo_events")
    spark.sql(s"CREATE TABLE demo_events USING graft " +
      s"OPTIONS (path '$baseDir', item 'EVENTS')")
    val sqlRows = spark.sql(
      "SELECT count(*) AS n FROM demo_events " +
        "WHERE TS BETWEEN '2024-01-10' AND '2024-01-20'"
    ).collect()(0).getLong(0)
    // the printed deltas are MEASURED, not hard-coded: on a re-run
    // against an existing baseDir the row already exists and both
    // inserts honestly report 0
    val before = spark.sql("SELECT count(*) FROM demo_events").collect()(0).getLong(0)
    spark.sql(
      "INSERT INTO demo_events VALUES (TIMESTAMP'2024-02-01 00:00:00', 999999, 1, 'click', 1.0)")
    val mid = spark.sql("SELECT count(*) FROM demo_events").collect()(0).getLong(0)
    spark.sql( // idempotent: the same insert again appends zero rows
      "INSERT INTO demo_events VALUES (TIMESTAMP'2024-02-01 00:00:00', 999999, 1, 'click', 1.0)")
    val after = spark.sql("SELECT count(*) FROM demo_events").collect()(0).getLong(0)
    spark.sql("DROP TABLE IF EXISTS demo_events")
    println(
      s"[demo] sql front door: $sqlRows rows in range via SELECT (bucket-pruned), " +
        s"INSERT INTO twice: $before -> $mid -> $after rows " +
        s"(first +${mid - before}, second +${after - mid}: a dedup no-op)")

    // catalog plugin: one conf pair makes the store a SQL catalog —
    // items are discoverable (SHOW TABLES) and queryable by name with
    // zero per-item DDL, through the same pruned GraftTable
    spark.conf.set("spark.sql.catalog.demostore", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.demostore.path", baseDir)
    val catTables = spark.sql("SHOW TABLES IN demostore")
      .collect().map(_.getString(1)).sorted.mkString(",")
    val catRows = spark.sql(
      "SELECT count(*) AS n FROM demostore.EVENTS " +
        "WHERE TS BETWEEN '2024-01-10' AND '2024-01-20'"
    ).collect()(0).getLong(0)
    println(
      s"[demo] catalog: SHOW TABLES IN demostore -> [$catTables]; " +
        s"demostore.EVENTS range SELECT -> $catRows rows (same pruned scan)")

    // CTAS through the staging protocol: nothing visible until commit;
    // a failed CTAS (runtime error mid-SELECT) leaves no item behind
    val ctasRows = {
      spark.sql(
        "CREATE TABLE demostore.JAN AS SELECT * FROM demostore.EVENTS " +
          "WHERE TS BETWEEN '2024-01-10' AND '2024-01-20'")
      spark.sql("SELECT count(*) FROM demostore.JAN").collect()(0).getLong(0)
    }
    val ctasFailClean =
      try {
        spark.sql(
          "CREATE TABLE demostore.BOOM AS SELECT TS, EVENT_ID, USER_ID, EVENT_TYPE, " +
            "CAST(VALUE / (VALUE - VALUE) AS DOUBLE) AS VALUE FROM demostore.EVENTS")
        false // must not reach: ANSI divide-by-zero throws mid-SELECT
      } catch {
        case _: Throwable => spark.sql("SHOW TABLES IN demostore")
          .collect().forall(_.getString(1) != "BOOM")
      }
    println(
      s"[demo] ctas: demostore.JAN AS SELECT -> $ctasRows rows; " +
        s"failed CTAS left no visible item: $ctasFailClean")

    // footer-answered SQL: the unfiltered AND the bucket-aligned ranged
    // report shapes plan NO file scan (DSv2 aggregate pushdown + the
    // FooterRangeAggregates rule); "newest k" reads a bucket suffix
    val fa = spark.sql(
      "SELECT count(*), min(TS), max(TS) FROM demostore.EVENTS").collect()(0)
    val faRanged = spark.sql(
      "SELECT count(*) FROM demostore.EVENTS " +
        "WHERE TS >= '2024-01-10' AND TS < '2024-01-20'").collect()(0).getLong(0)
    val faPlanLocal = !spark.sql(
      "SELECT count(*) FROM demostore.EVENTS " +
        "WHERE TS >= '2024-01-10' AND TS < '2024-01-20'")
      .queryExecution.optimizedPlan.toString.contains("RelationV2")
    val newest = spark.sql(
      "SELECT TS FROM demostore.EVENTS ORDER BY TS DESC LIMIT 3")
      .collect().map(_.getTimestamp(0)).mkString(", ")
    println(
      s"[demo] footer-answered sql: count/min/max = ${fa.getLong(0)} / " +
        s"${fa.getTimestamp(1)} / ${fa.getTimestamp(2)} (no scan); " +
        s"day-aligned ranged count = $faRanged " +
        s"(plan is ${if (faPlanLocal) "a LocalRelation, footers only" else "a scan"}); " +
        s"newest-3 via pushed topN = [$newest]")

    // DSv2 streaming read: the item as a micro-batch stream from any
    // binding; AvailableNow drains it once into a memory sink here
    val streamed = {
      val q = spark.readStream.format("graft").option("item", "EVENTS")
        .load(baseDir)
        .writeStream.format("memory").queryName("demo_stream")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table("demo_stream").count()
    }
    println(s"[demo] readStream.format(graft): drained $streamed rows " +
      "via micro-batch file offsets (delta-only on resume; GraftStreamSpec)")

    // cross-JVM writer lease (opt-in): every mutation takes and
    // releases a per-item lease file; multi-driver deployments enable
    // this on every writer
    val lstore = Store.open(
      spark, baseDir + "-leased",
      cols = Some(Seq(
        "EVENT_ID" -> LongType, "USER_ID" -> LongType,
        "EVENT_TYPE" -> StringType, "VALUE" -> DoubleType)),
      index = Some("TS"), writerLease = true)
    lstore.write("events", events)
    lstore.appendNewOnly("events", events)
    // the lease log's max slot carries the "-" released sentinel once
    // the holder let go (slots are claimed, never deleted, so release
    // is a sentinel entry rather than an absent file)
    val leaseHp = new org.apache.hadoop.fs.Path(baseDir + "-leased", ".lease/EVENTS")
    val leaseFs = leaseHp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaseClear = Store.leaseState(leaseFs, leaseHp).forall(_._1 == "-")
    println(
      s"[demo] leased store: rows=${lstore("events").count()} " +
        s"(each mutation claimed a cross-JVM .lease/EVENTS slot; " +
        s"released after: $leaseClear)")

    spark.stop()
  }
}
