package graft

import graft.sources.{SchemaError, Store}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The `GraftCatalog` TableCatalog plugin: one conf line turns a store
  * into a SQL catalog — `SHOW TABLES IN <cat>` lists its items with no
  * per-item DDL, `SELECT * FROM <cat>.ITEM` loads the SAME GraftTable
  * the provider serves (so pruning/INSERT semantics carry over,
  * plan-asserted below), and the item lifecycle (CREATE/DROP) maps to
  * Store write/drop. The reference's `store['KEY']` discovery
  * (oakstore/store.py:133-134) lifted to the catalog surface.
  */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  def bars(n: Int, seed: Long = 7): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val t0 = java.time.LocalDate.parse("2015-01-01")
      .atStartOfDay(java.time.ZoneOffset.UTC)
    var px = 100.0
    (0 until n).map { i =>
      px = math.max(1.0, px + rnd.nextGaussian())
      (Timestamp.from(t0.plusDays(i).toInstant), px, px + 1, px - 1, px, 1000L + i)
    }.toDF("date", "open", "high", "low", "close", "volume")
  }

  def parquetScans(df: DataFrame): Seq[ParquetScan] = {
    df.collect()
    val root = df.queryExecution.executedPlan
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    strip(root).collect { case b: BatchScanExec => b.scan }.collect {
      case ps: ParquetScan => ps
      case g: graft.sources.v2.GraftScan => g.parquet.asInstanceOf[ParquetScan]
    }
  }

  /** One catalog (name `gcat`) over one bucketed store for the whole
    * suite — catalog conf is resolved at first reference and cached by
    * Spark per session, which is exactly the deployment shape.
    */
  lazy val storeDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog").toString
    val s = Store.open(spark, dir, bucket = Some("month"))
    s.write("MSFT", bars(100)) // 2015-01-01..2015-04-10 → 4 month buckets
    s.write("AAPL", bars(50, seed = 11))
    spark.conf.set("spark.sql.catalog.gcat", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat.path", dir)
    dir
  }

  test("SHOW TABLES IN gcat lists the store's items with zero per-item DDL") {
    storeDir
    val names = spark.sql("SHOW TABLES IN gcat").select("tableName")
      .as[String].collect().toSet
    assert(names == Set("MSFT", "AAPL"), s"got $names")
    // items created by ANY writer appear on the next listing — no
    // refresh incantation (listings go to the filesystem)
    Store.attach(spark, storeDir).write("TSLA", bars(10, seed = 3))
    val after = spark.sql("SHOW TABLES IN gcat").select("tableName")
      .as[String].collect().toSet
    assert(after == Set("MSFT", "AAPL", "TSLA"), s"got $after")
    spark.sql("DROP TABLE gcat.TSLA")
  }

  test("catalog-qualified SELECT prunes bucket dirs and pushes row-group filters — same plan as the provider") {
    storeDir
    val df = spark.sql(
      "SELECT OPEN, CLOSE FROM gcat.MSFT " +
        "WHERE DATE BETWEEN '2015-02-01' AND '2015-03-01'")
    val api = Store.attach(spark, storeDir).query("MSFT",
      Some(Timestamp.valueOf("2015-02-01 00:00:00")),
      Some(Timestamp.valueOf("2015-03-01 00:00:00")),
      columns = Some(Seq("OPEN", "CLOSE")))
    assert(df.exceptAll(api).count() == 0 && api.exceptAll(df).count() == 0)
    val scans = parquetScans(df)
    assert(scans.size == 1)
    assert(scans.head.fileIndex.rootPaths.map(_.getName).toSet ==
      Set("__bucket=2015-02", "__bucket=2015-03"),
      "catalog read must prune to exactly the in-range bucket dirs")
    val pushedStr = scans.head.pushedFilters.mkString(";")
    assert(pushedStr.contains("GreaterThanOrEqual(DATE") &&
      pushedStr.contains("LessThanOrEqual(DATE"), s"pushed: $pushedStr")
    val read = scans.head.readDataSchema.fieldNames.toSet
    assert(read == Set("DATE", "OPEN", "CLOSE"), s"ReadSchema: $read")
  }

  test("catalog-qualified INSERT INTO is the += contract: idempotent, and CREATE TABLE makes an empty item") {
    storeDir
    val s = Store.attach(spark, storeDir)
    spark.sql("CREATE TABLE gcat.FRESH")
    assert(s.exists("FRESH") && s("FRESH").count() == 0,
      "CREATE TABLE must make an empty item")
    spark.sql("INSERT INTO gcat.FRESH VALUES " +
      "(TIMESTAMP'2015-05-01 00:00:00', 1.0, 2.0, 0.5, 1.5, 100), " +
      "(TIMESTAMP'2015-05-02 00:00:00', 1.1, 2.1, 0.6, 1.6, 101)")
    assert(s("FRESH").count() == 2)
    // re-running the SAME insert appends zero rows (appendNewOnly)
    spark.sql("INSERT INTO gcat.FRESH VALUES " +
      "(TIMESTAMP'2015-05-01 00:00:00', 1.0, 2.0, 0.5, 1.5, 100), " +
      "(TIMESTAMP'2015-05-02 00:00:00', 1.1, 2.1, 0.6, 1.6, 101)")
    assert(s("FRESH").count() == 2, "duplicate insert must dedup to a no-op")
    // CREATE over an existing item is the standard SQL error, and
    // IF NOT EXISTS swallows it
    val e = intercept[Exception](spark.sql("CREATE TABLE gcat.FRESH"))
    assert(e.getMessage.contains("FRESH"), s"wrong error: ${e.getMessage}")
    spark.sql("CREATE TABLE IF NOT EXISTS gcat.FRESH")
    assert(s("FRESH").count() == 2)
    // DROP maps to Store.drop; IF EXISTS on a missing item is quiet
    spark.sql("DROP TABLE gcat.FRESH")
    assert(!s.exists("FRESH"))
    spark.sql("DROP TABLE IF EXISTS gcat.FRESH")
  }

  test("a VERSIONED store works through the catalog: list, create-empty, insert, drop") {
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog-vers").toString
    val s = Store.open(spark, dir, versioned = true)
    s.write("MSFT", bars(15))
    spark.conf.set("spark.sql.catalog.gcatv", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcatv.path", dir)
    assert(spark.sql("SHOW TABLES IN gcatv").select("tableName")
      .as[String].collect().toSet == Set("MSFT"))
    assert(spark.sql("SELECT count(*) FROM gcatv.MSFT").as[Long].head() == 15)
    spark.sql("CREATE TABLE gcatv.FRESH") // empty item = one pointer commit
    assert(s.exists("FRESH") && s("FRESH").count() == 0)
    spark.sql("INSERT INTO gcatv.FRESH VALUES " +
      "(TIMESTAMP'2015-05-01 00:00:00', 1.0, 2.0, 0.5, 1.5, 100)")
    spark.sql("INSERT INTO gcatv.FRESH VALUES " +
      "(TIMESTAMP'2015-05-01 00:00:00', 1.0, 2.0, 0.5, 1.5, 100)")
    assert(s("FRESH").count() == 1, "idempotent insert on the versioned layout")
    spark.sql("DROP TABLE gcatv.FRESH")
    assert(!s.exists("FRESH"))
    // a half-created orphan dir (no pointer) is NOT a table
    assert(s.vacuum(0L) >= 0L)
    assert(spark.sql("SHOW TABLES IN gcatv").count() == 1)
  }

  test("catalog-qualified STREAMING read: spark.readStream.table(gcat.MSFT) drains the item") {
    storeDir
    val out = java.nio.file.Files.createTempDirectory("graft-cat-stream").toString
    val q = spark.readStream.table("gcat.MSFT")
      .writeStream.format("parquet")
      .option("path", out + "/out")
      .option("checkpointLocation", out + "/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out + "/out")
    val batch = Store.attach(spark, storeDir)("MSFT")
    assert(got.count() == 100)
    assert(got.exceptAll(batch).count() == 0 && batch.exceptAll(got).count() == 0,
      "catalog-qualified stream must equal the batch item")
  }

  test("SQL tooling paths resolve: DESCRIBE TABLE and spark.table on catalog items") {
    storeDir
    val cols = spark.sql("DESCRIBE TABLE gcat.MSFT").select("col_name")
      .as[String].collect().toSet
    assert(Set("DATE", "OPEN", "CLOSE", "VOLUME").subsetOf(cols), s"got $cols")
    assert(spark.table("gcat.MSFT").count() == 100)
  }

  test("catalog writerLease option: INSERTs claim and release the cross-JVM lease") {
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog-lease").toString
    val s = Store.open(spark, dir)
    s.write("MSFT", bars(5))
    spark.conf.set("spark.sql.catalog.gcatl", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcatl.path", dir)
    spark.conf.set("spark.sql.catalog.gcatl.writerLease", "true")
    spark.sql("INSERT INTO gcatl.MSFT VALUES " +
      "(TIMESTAMP'2015-08-01 00:00:00', 1.0, 2.0, 0.5, 1.5, 100)")
    assert(s("MSFT").count() == 6)
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaseDir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(hp, ".lease"), "MSFT")
    assert(Store.leaseState(fs, leaseDir).exists(_._1 == "-"),
      "catalog-leased INSERT must have claimed and released a lease slot")
  }

  test("failure modes: missing table, nested namespace, ALTER/RENAME/PARTITIONED refusals") {
    storeDir
    val missing = intercept[Exception](spark.sql("SELECT * FROM gcat.NOPE").collect())
    assert(missing.getMessage.contains("NOPE"), s"wrong error: ${missing.getMessage}")
    // flat catalog: nested namespaces don't resolve
    val nested = intercept[Exception](spark.sql("SELECT * FROM gcat.ns.MSFT").collect())
    assert(nested.getMessage.toLowerCase.contains("not") ||
      nested.getMessage.toLowerCase.contains("cannot"), s"got: ${nested.getMessage}")
    assert(spark.sql("SHOW NAMESPACES IN gcat").collect().isEmpty)
    // the store owns schema and layout: ALTER / RENAME / PARTITIONED BY refuse
    intercept[Exception](spark.sql("ALTER TABLE gcat.MSFT ADD COLUMN x DOUBLE"))
    intercept[Exception](spark.sql("ALTER TABLE gcat.MSFT RENAME TO gcat.MSFT2"))
    intercept[Exception](spark.sql(
      "CREATE TABLE gcat.PARTED PARTITIONED BY (VOLUME)"))
    assert(!Store.attach(spark, storeDir).exists("PARTED"))
    // a schema'd CREATE must agree with the store-wide schema
    intercept[Exception](spark.sql("CREATE TABLE gcat.BAD (d TIMESTAMP, x DOUBLE)"))
    assert(!Store.attach(spark, storeDir).exists("BAD"))
  }
}
