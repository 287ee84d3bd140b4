package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-key stress for the as-of family (r13 verdict task #4): before
  * round 14 the as-of carry ran one (key)-partitioned running window,
  * so a single hot key — one user owning the whole corpus — serialized
  * into ONE task regardless of cluster size (the shape ts_ewma escaped
  * in r13). The fixture forces EVERY event onto user_id 1 at 1x and
  * `factor`x the sf corpus, so the wall-time exponent
  * log_factor(t_Nx / t_1x) reads the residual serialization directly:
  * ~1.0 means the clones ride fully parallel block tasks (linear work,
  * constant wall per unit of work), >1 means a straggler chain.
  *
  * Clones keep (user_id, ts) unique — each copy shifts ts by i
  * microseconds and offsets event_id — so the as-of tie contract is
  * preserved while the per-(key, hour-block) population grows 10x.
  *
  * Run: sbt "runMain graft.tools.StressAsof /root/testdata/sf0.1 /tmp/stressasof 10"
  */
object StressAsof {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/stressasof"
    val factor = if (args.length > 2) args(2).toInt else 10

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables
      .events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .withColumn("user_id", lit(1L))

    def build(f: Int): String = {
      val dir = s"$outDir/hot$f"
      val nBase = base.count()
      val cloned = (0 until f)
        .map { i =>
          base
            .withColumn("event_id", col("event_id") + lit(i * 10000000L))
            .withColumn("ts", expr(s"timestampadd(MICROSECOND, $i, ts)"))
        }
        .reduce(_ unionByName _)
      cloned.write.mode("overwrite").parquet(s"$dir/events.parquet")
      println(s"[stressasof] hot$f: ${nBase * f} rows, one user_id")
      dir
    }

    val d1 = build(1)
    val dN = build(factor)

    def time(name: String, dir: String): Double = {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up absorbs JVM/codegen start-up
    try time("join_asof", d1)
    catch { case e: Throwable => println(s"warmup: $e") }

    println(s"| query | 1x | ${factor}x | exponent |")
    Seq("join_asof", "join_asof_tol", "join_asof_fwd", "join_asof_near").foreach { q =>
      val t1 = (1 to 2).map(_ => time(q, d1)).min
      val tN = (1 to 2).map(_ => time(q, dN)).min
      val exp = math.log(tN / t1) / math.log(factor.toDouble)
      println(f"| $q | $t1%.2f s | $tN%.2f s | $exp%.2f |")
    }

    // control: the pre-r14 single-window shape (threshold = MaxValue
    // forces the cold path) on the same hot fixtures — the carry
    // serializes the one key into one task at any scale
    def timeSerial(dir: String): Double = {
      spark.catalog.clearCache()
      System.gc()
      val e = graft.Tables.events(spark, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "ts", "user_id")
      val clicks = e.filter(col("event_type") === "click")
      val t0 = System.nanoTime()
      graft.operators.TimeSeries
        .asOfJoin(purchases, clicks, "user_id", "ts", "ts",
          Seq("event_id" -> "click_id", "ts" -> "click_ts"),
          hotKeyThreshold = Long.MaxValue)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val s1 = (1 to 2).map(_ => timeSerial(d1)).min
    val sN = (1 to 2).map(_ => timeSerial(dN)).min
    val sExp = math.log(sN / s1) / math.log(factor.toDouble)
    println(f"| join_asof SERIAL control | $s1%.2f s | $sN%.2f s | $sExp%.2f |")
    spark.stop()
  }
}
