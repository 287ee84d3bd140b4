package graft.tools

import graft.sources.Store
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Maintenance-cost receipt: whole-item compact() vs bucket-granular
  * compactBuckets() on a store whose append churn lands in ONE hot
  * bucket of many — the steady-state shape of a time-series store
  * (history cold, the current period accumulating small files).
  * compact() pays O(history) to fix it; compactBuckets() pays O(hot
  * bucket). Run:
  *   sbt "runMain graft.tools.StoreMaintBench /tmp/maintbench"
  * Prints one line per strategy; the receipt lives in PLANS.md.
  */
object StoreMaintBench {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/tmp/maintbench")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val months = 48
    val rowsPerMonth = 250000
    val hotAppends = 8

    def monthData(m: Int, seed: Int): org.apache.spark.sql.DataFrame = {
      val t0 = java.time.LocalDate.parse("2020-01-01")
        .atStartOfDay(java.time.ZoneOffset.UTC).plusMonths(m.toLong)
      spark.range(rowsPerMonth.toLong)
        .select(
          // spread rows across the month, keyed by (seed, id) so every
          // append batch is disjoint
          expr(s"timestamp_micros(${t0.toInstant.toEpochMilli} * 1000 + id * 25000000 % 2500000000000)")
            .as("ts"),
          (col("id") + seed.toLong * 10000000L).as("event_id"),
          (col("id") % 997).as("user_id"),
          rand(seed.toLong).as("value"))
    }

    def freshStore(dir: String, versioned: Boolean = false): Store = {
      ToolUtil.wipeDir(dir)
      // chunkRows sized so the hot bucket's canonical rewrite has real
      // parallelism (rows/chunkRows partitions) — at production scale a
      // hot bucket holds many chunks by construction; the default 1 M
      // would make this small fixture a degenerate 1-partition rewrite
      Store.open(spark, dir,
        cols = Some(Seq(
          "EVENT_ID" -> LongType, "USER_ID" -> LongType, "VALUE" -> DoubleType)),
        index = Some("TS"), bucket = Some("month"), chunkRows = 50000L,
        versioned = versioned)
    }

    def build(dir: String, versioned: Boolean = false): Store = {
      val s = freshStore(dir, versioned)
      // `months` months of compacted history in one write...
      s.write("EVENTS", (0 until months).map(monthData(_, 0)).reduce(_ unionByName _))
      // ...then append churn into the LAST month only (the hot bucket)
      (1 to hotAppends).foreach(i =>
        s.appendNewOnly("EVENTS", monthData(months - 1, i)))
      s
    }

    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[maintbench] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val hotSince = Timestamp.from(
      java.time.LocalDate.parse("2020-01-01")
        .atStartOfDay(java.time.ZoneOffset.UTC).plusMonths((months - 1).toLong).toInstant)

    val s2 = build(baseDir + "-buckets")
    timed("compactBuckets") {
      val n = s2.compactBuckets("EVENTS", maxFilesPerBucket = 8,
        since = Some(hotSince))
      println(s"[maintbench] buckets rewritten: $n")
    }

    timed("compactBuckets 2nd") {
      val n = s2.compactBuckets("EVENTS", maxFilesPerBucket = 8,
        since = Some(hotSince))
      println(s"[maintbench] buckets rewritten on 2nd call: $n (must be 0)")
    }

    val s1 = build(baseDir + "-whole")
    timed("compact (whole)") { s1.compact("EVENTS") }
    // same end state where it matters: the hot bucket is small again
    println(s"[maintbench] rows whole=${s1("EVENTS").count()} buckets=${s2("EVENTS").count()}")

    // ===== versioned layout: the pointer commit must not change the
    // maintenance cost curve. compactBuckets rewrites IN-PLACE inside
    // the current version (copying 100 TB of cold buckets into a fresh
    // version to fix one directory would defeat the point), so its cost
    // should match the flat numbers above; the only versioned-specific
    // maintenance is the orphan-version sweep, whose cost must be
    // bounded by ORPHAN COUNT, never by history size.
    val s3dir = baseDir + "-versioned"
    val s3 = build(s3dir, versioned = true)
    timed("compactBuckets vers") {
      val n = s3.compactBuckets("EVENTS", maxFilesPerBucket = 8,
        since = Some(hotSince))
      println(s"[maintbench] versioned buckets rewritten: $n")
    }
    timed("compactBuckets v2nd") {
      val n = s3.compactBuckets("EVENTS", maxFilesPerBucket = 8,
        since = Some(hotSince))
      println(s"[maintbench] versioned buckets rewritten on 2nd call: $n (must be 0)")
    }

    // orphan sweep: plant k version dirs no pointer names — exactly the
    // debris a versionSwap crashed before its pointer write leaves —
    // and time vacuum(0) at two orphan counts over the SAME 48-month
    // history. Equal-size orphans, so a flat cost-per-orphan line means
    // the sweep scales with debris, not with the item.
    def plantOrphans(k: Int, tag: String): Unit =
      (1 to k).foreach { i =>
        monthData(0, 1000 + i).limit(20000).write
          .parquet(s"$s3dir/items/EVENTS/v-$tag$i")
      }
    plantOrphans(2, "orphan-a")
    timed("vacuum 2 orphans") {
      println(s"[maintbench] swept: ${s3.vacuum(0L)} (expect 2)")
    }
    plantOrphans(8, "orphan-b")
    timed("vacuum 8 orphans") {
      println(s"[maintbench] swept: ${s3.vacuum(0L)} (expect 8)")
    }
    timed("vacuum 0 orphans") {
      println(s"[maintbench] swept: ${s3.vacuum(0L)} (expect 0 — steady state)")
    }
    println(s"[maintbench] rows versioned=${s3("EVENTS").count()}")

    spark.stop()
  }
}
