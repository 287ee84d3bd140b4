package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Scaling receipts for the stateful streaming family (r14 verdict
  * task #7): drives stream_zscore and stream_topk — the two entries
  * with real per-key state — at increasing key cardinality and records
  * per-batch wall time and state-store size from the query's own
  * progress metrics. What "sub-linear" means per metric:
  *
  *  - state ROWS are the operator's contract: one ring buffer per user
  *    (zscore) / one k-heap per hour (topk) — linear in KEYS by design
  *    and the receipt proves the constant is flat (rows == keys, no
  *    amplification);
  *  - per-batch WALL must scale with the BATCH's rows, not with total
  *    state: a 10× key universe with the same per-batch row count must
  *    not make batches ~10× slower (state is partitioned HDFS-backed
  *    maps, commit cost ∝ delta, not ∝ store size).
  *
  * Run (idle box):
  *   sbt "runMain graft.tools.StressStreams zscore 1000,10000 40"
  *   sbt "runMain graft.tools.StressStreams topk 100,1000 200"
  */
object StressStreams {

  def main(args: Array[String]): Unit = {
    val op = args.headOption.getOrElse("zscore")
    val keyCounts = (if (args.length > 1) args(1) else "1000,10000")
      .split(",").map(_.trim.toInt).toSeq
    val perKey = if (args.length > 2) args(2).toInt else 40
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    /** Synthetic events: `keys` series, `perKey` events each, spread
      * over `perKey` minutes so every key is touched in every batch
      * (the worst commit-delta case: delta size == key count).
      */
    def corpus(keys: Int): DataFrame = {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      spark.range(keys.toLong * perKey).select(
        col("id").as("event_id"),
        (col("id") % keys).as("user_id"),
        // minute i for event i-of-key: time advances across batches
        expr(s"timestamp_millis(${t0}L + (id div $keys) * 60000L)").as("ts"),
        (rand(42) * 100).as("value"))
    }

    for (keys <- keyCounts) {
      val work = Files.createTempDirectory(s"graft-sstream-$op-$keys").toString
      val (stage, out, chk) = (s"$work/in", s"$work/out", s"$work/chk")
      val df = corpus(keys)
      // four time-ordered batches, one file each; the LAST batch takes
      // the division remainder so every generated row is driven (a
      // floor-quartered upper bound silently drops perKey % 4 minutes
      // of events and the rows= line would overstate the driven input)
      require(perKey >= 4, s"perKey must be >= 4 to form 4 batches, got $perKey")
      val quarter = perKey / 4
      (0 until 4).foreach { i =>
        val hi = if (i == 3) perKey else (i + 1) * quarter
        df.filter(expr(s"event_id div $keys") >= i * quarter &&
            expr(s"event_id div $keys") < hi)
          .coalesce(1).write.parquet(s"$stage/b$i")
        val p = java.nio.file.Paths.get(s"$stage/b$i")
        val walk = java.nio.file.Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala
            .filter(f => java.nio.file.Files.isRegularFile(f) &&
              !f.getFileName.toString.startsWith("_"))
            .foreach(f => java.nio.file.Files.setLastModifiedTime(f,
              java.nio.file.attribute.FileTime.fromMillis(1000000000L + i * 100000)))
        } finally walk.close()
      }
      val schema = spark.read.parquet(s"$stage/b0").schema
      val src = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
      val sink = op match {
        case "zscore" =>
          Streams.zscoreOn(src).writeStream
            .format("parquet").option("path", out)
            .option("checkpointLocation", chk).outputMode("append")
        case "topk" =>
          // per-hour top-5: key cardinality = distinct hours, so the
          // corpus maps keys→hours by widening the per-event minute
          // step to an hour step per "key"
          val hours = src.select(
            col("event_id"),
            expr(s"timestamp_millis(1704067200000L + (user_id * 3600L + (event_id div ${keys})) * 1000L)").as("ts"),
            col("value"))
          Streams.topkOn(hours, 5).toDF("hour_epoch", "top")
            .writeStream
            .option("checkpointLocation", chk).outputMode("update")
            .foreachBatch { (d: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
              d.write.mode("append").parquet(out): Unit
            }
        case other => sys.error(s"unknown op $other")
      }
      val t0 = System.nanoTime()
      val q = sink.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val total = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.filter(_.numInputRows > 0)
      val batchMs = progress.map(_.durationMs.get("triggerExecution").toLong)
      val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal)).lastOption.getOrElse(-1L)
      val stateMem = progress.flatMap(_.stateOperators.map(_.memoryUsedBytes)).lastOption.getOrElse(-1L)
      println(
        f"[stress-streams] op=$op keys=$keys rows=${keys.toLong * perKey} " +
          f"batches=${batchMs.length} wall=$total%.2fs " +
          s"batch_ms=${batchMs.mkString("[", ",", "]")} " +
          s"state_rows=$stateRows state_bytes=$stateMem")
    }
    spark.stop()
  }
}
