package graft.tools

import graft.Bench
import org.apache.spark.sql.SparkSession

/** Pre-flight window check: runs the Bench absolute probe pair (150M
  * SplitMix64 + the canonical sf0.1 lineitem aggregate, min-of-3 each)
  * WITHOUT paying for a full bench run, and prints a verdict against
  * the banked envelope (BASELINE.md "Probe envelope"). This box's
  * host-level degradations are invisible to loadavg (the r16/r17
  * worked examples read loadavg ~0.02 while queries inflated 2-4x), so
  * the only way to know whether a closing-bench window is worth
  * spending is to measure it — this tool makes that a ~30 s question
  * instead of a wasted ~10 min artifact.
  *
  *   sbt -batch "runMain graft.tools.WindowProbe"
  *
  * Prints one line: `probe cpu=<ms> scan=<ms> scale=<x> verdict=CALM|DEGRADED`
  * and exits 0 on CALM, 2 on DEGRADED (scriptable gate).
  */
object WindowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one untimed scan: the probe query's own codegen is JVM state, not
    // window state (same discipline as Bench's start-of-run probe)
    try { if (new java.io.File(Bench.probeScanFile).isFile) Bench.probeScanMs(spark) }
    catch { case _: Throwable => () }
    val (cpu, scan) = Bench.probePair(spark)
    val cpuScale = cpu / Bench.probeCpuNominalMs
    val scanScale = if (scan > 0) scan / Bench.probeScanNominalMs else -1.0
    val scale = math.max(cpuScale, scanScale)
    val degraded = cpuScale > Bench.probeCpuDegradedAt ||
      (scan > 0 && scanScale > Bench.probeScanDegradedAt)
    println(f"probe cpu=$cpu%.0fms scan=$scan%.0fms scale=$scale%.2f " +
      s"verdict=${if (degraded) "DEGRADED" else "CALM"}")
    spark.stop()
    if (degraded) sys.exit(2)
  }
}
