package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet ts vintage handling (nanos or micros) — graft.Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // iteration aid: SPARK_GRAFT_VERIFY_ONLY=q1,q2 dumps a subset (the
    // driver never sets it, so the recorded gate covers every query)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY").map(_.split(",").map(_.trim).toSet)
    // a subset run into a dir holding a full manifest would silently
    // shrink that manifest (later compares would check 1 query and
    // report green) — demand a fresh outDir instead
    if (only.isDefined && Files.exists(Paths.get(s"$outDir/oracle_sql.json")))
      throw new IllegalStateException(
        s"SPARK_GRAFT_VERIFY_ONLY set but $outDir already holds an oracle_sql.json; " +
          "use a fresh outDir for subset runs")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // the dump must stay INT96 so pandas reads NAIVE datetimes (the
        // driver's dtype compare); store-backed queries (e.g.
        // stream_store_ingest) pin the session to TIMESTAMP_MICROS —
        // tz-aware in pandas — so re-pin the dump type per write. Set
        // AFTER fn(): store writes inside it require MICROS (guarded).
        spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // several queries persist() intermediates they cannot unpersist
      // before their final action; release them so caches from earlier
      // queries don't compete for storage memory in later ones
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
