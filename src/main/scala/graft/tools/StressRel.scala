package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× clone-perturbed stress harness for the relational / join /
  * window headline family (round-7 verdict ask #6 — the one family the
  * round-5..7 stress campaigns left uncovered).
  *
  * Methodology matches the dedup/ANN and event/time-series campaigns:
  * every fact table is cloned `factor`× with KEY OFFSETS so per-key
  * fan-out stays constant — users, customers and orders scale WITH the
  * data (the scale-OUT shape a cluster sees), while the broadcast dims
  * (supplier/nation/region/part) stay fixed like real dimension tables.
  * Events get 1 s/clone ts jitter so time-grid queries (resample_*)
  * keep a fixed grid while densifying per cell — a 100× corpus covers
  * the same trading window, it does not stretch it.
  *
  * Run (fixture is built once, reused after):
  *   sbt "runMain graft.tools.StressRel /root/testdata/sf0.1 /tmp/stressjoin100 100 join_inner join_asof ..."
  */
object StressRel {

  /** Queries stressed when none are named: every headline query that
    * reads orders/customer/lineitem/events through a join, grouping
    * set, pivot, window or time-grid — the shapes the verdict flagged
    * as untested at 100× (join_asof's union-window, resample_ffill's
    * grid explode).
    */
  val defaultQueries: Seq[String] = Seq(
    "join_inner", "join_broadcast", "join_semi", "join_anti", "join_outer",
    "join_range", "join_asof", "join_asof_fwd", "join_interval",
    "agg_hash", "agg_rollup", "agg_cube", "agg_grouping_sets",
    "agg_pivot", "agg_unpivot",
    "win_rank", "win_analytic", "win_cume", "win_dist",
    "topk_pergroup", "sort_limit",
    "resample_ohlcv", "resample_ffill", "resample_interp"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/stressjoin100"
    val factor = if (args.length > 2) args(2).toInt else 100
    val names = if (args.length > 3) args.drop(3).toSeq else defaultQueries

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "96g")
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    buildFixture(spark, sfDir, outDir, factor)

    def time(name: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, outDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // one untimed warm-up absorbs JVM/codegen start-up
    try time("agg_hash") catch { case e: Throwable => println(s"warmup: $e") }
    println(f"| query | ${factor}%dx |")
    names.foreach { n =>
      val t =
        try f"${time(n)}%.1f s"
        catch { case e: Throwable => s"FAIL ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}" }
      println(s"| $n | $t |")
    }
    spark.stop()
  }

  /** Clone each fact table `factor`× with per-clone key offsets (keys
    * stay disjoint across clones → constant per-key fan-out). Dims are
    * copied through untouched. Idempotent: skips tables already built.
    */
  def buildFixture(spark: SparkSession, sfDir: String, outDir: String, factor: Int): Unit = {
    val done = new java.io.File(s"$outDir/_built_$factor")
    if (done.exists()) { println(s"[stress] fixture $outDir exists, reusing"); return }

    def src(t: String) = spark.read.parquet(s"$sfDir/$t.parquet")
    def clones = spark.range(factor).select(col("id").cast("int").as("clone"))
    def offset(c: String, step: Long) =
      (col(c) + col("clone").cast("long") * step).as(c)

    // steps: next power-of-10 above the sf0.1 key ranges, so cloned key
    // spaces never collide and clone membership stays readable in the id
    val CUST = 1000000L // c_custkey / o_custkey
    val ORD = 10000000L // o_orderkey / l_orderkey
    val USER = 100000L // user_id
    val EVT = 10000000L // event_id

    val orders = src("orders").crossJoin(clones)
    writeT(orders.select(
      (offset("o_orderkey", ORD) +: offset("o_custkey", CUST) +:
        src("orders").columns.filterNot(Set("o_orderkey", "o_custkey")).map(col)).toIndexedSeq: _*
    ), outDir, "orders")

    val lineitem = src("lineitem").crossJoin(clones)
    writeT(lineitem.select(
      (offset("l_orderkey", ORD) +: src("lineitem").columns.filter(_ != "l_orderkey")
        .map(col)).toIndexedSeq: _*
    ), outDir, "lineitem")

    val customer = src("customer").crossJoin(clones)
    writeT(customer.select(
      (offset("c_custkey", CUST) +: src("customer").columns.filter(_ != "c_custkey")
        .map(col)).toIndexedSeq: _*
    ), outDir, "customer")

    // events: ts jittered +1 s per clone, in whichever domain the corpus
    // vintage ships (long nanos vs native timestamp — graft.Tables)
    val rawEvents = graft.Tables.table(spark, sfDir, "events")
    val jitter = rawEvents.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        (col("ts") + col("clone").cast("long") * 1000000000L).as("ts")
      case _ =>
        expr("timestampadd(SECOND, clone, ts)").as("ts")
    }
    val events = rawEvents.crossJoin(clones)
    writeT(events.select(
      offset("event_id", EVT), offset("user_id", USER),
      col("event_type"), col("value"), jitter
    ), outDir, "events")

    // dims: pass through (broadcast sides stay dimension-sized at any SF)
    Seq("supplier", "nation", "region", "part", "documents", "embeddings")
      .foreach(t => writeT(src(t), outDir, t))

    done.getParentFile.mkdirs()
    done.createNewFile()
    println(s"[stress] fixture built at $outDir (${factor}x)")
  }

  private def writeT(df: DataFrame, outDir: String, t: String): Unit = {
    df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    println(s"[stress] wrote $t")
  }
}
