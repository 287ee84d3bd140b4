package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Times named queries (after one warm-up run of the first) against a
  * testdata dir: sbt "runMain graft.tools.TimeQuery <dir> q1 q2 ...".
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(names.head) // warm-up
    for (n <- names) println(f"[time] $n%-24s ${run(n)}%8.2f s")
    spark.stop()
  }
}
