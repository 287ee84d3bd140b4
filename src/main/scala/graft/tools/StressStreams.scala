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
  * Round 16 extends the receipt to the remaining three per-key-state
  * streams, with the adversarial axis their contracts name:
  *
  *  - funnel: per-user candidate buffers — driven with late-but-
  *    inside-slack event-time disorder (20% of events carry a
  *    timestamp minutes EARLIER than their arrival batch), the shape
  *    where an unbounded candidate buffer would hide; state rows must
  *    stay == users and bytes/user flat across a key sweep;
  *  - custom_state: one (n, sum) pair per user — rows == users;
  *  - minhash_dedup: one claimant Long per band bucket — rows ==
  *    distinct buckets (≈ docs × bands / dup-factor), never per-doc.
  *
  * Run (idle box):
  *   sbt "runMain graft.tools.StressStreams zscore 1000,10000 40"
  *   sbt "runMain graft.tools.StressStreams topk 100,1000 200"
  *   sbt "runMain graft.tools.StressStreams funnel 1000,10000 40"
  *   sbt "runMain graft.tools.StressStreams custom_state 1000,10000 40"
  *   sbt "runMain graft.tools.StressStreams minhash_dedup 500,5000 1"
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

    /** Events with a type column and seeded DISORDER: every 5th event's
      * time is pulled 1-3 minutes earlier than its arrival batch —
      * late-but-inside-slack rows, the funnel/custom_state adversarial
      * case (their state functions buffer against the 1-hour slack).
      */
    def corpusTyped(keys: Int): DataFrame =
      corpus(keys)
        .withColumn("event_type",
          element_at(array(lit("view"), lit("click"), lit("purchase")),
            (col("event_id") % 3).cast("int") + 1))
        .withColumn("ts",
          when(col("event_id") % 5 === 4,
            expr("ts - make_interval(0, 0, 0, 0, 0, cast(event_id % 3 + 1 as int), 0)"))
            .otherwise(col("ts")))

    /** Documents for minhash_dedup: `keys` docs, every PAIR shares its
      * text (id/2 keys the content), so half the band buckets see two
      * claim attempts — state must stay one Long per bucket.
      */
    def corpusDocs(keys: Int): DataFrame = {
      val words = (0 until 24).map(j =>
        concat(lit(s"w"), ((col("id") / 2).cast("long") * 31 + j) % 997))
      spark.range(keys.toLong).select(
        col("id").as("doc_id"),
        concat_ws(" ", words: _*).as("text"))
    }

    for (keys <- keyCounts) {
      val work = Files.createTempDirectory(s"graft-sstream-$op-$keys").toString
      val (stage, out, chk) = (s"$work/in", s"$work/out", s"$work/chk")
      val df = op match {
        case "funnel" | "custom_state" => corpusTyped(keys)
        case "minhash_dedup" => corpusDocs(keys)
        case _ => corpus(keys)
      }
      // four time-ordered batches, one file each; the LAST batch takes
      // the division remainder so every generated row is driven (a
      // floor-quartered upper bound silently drops perKey % 4 minutes
      // of events and the rows= line would overstate the driven input)
      // batch index: events batch by their per-key minute (time order,
      // so the disorder injection above is genuinely cross-batch);
      // docs batch by doc_id quarter (content pairs are ADJACENT ids,
      // so most dup pairs land in the same batch but the quarter
      // boundaries split some across batches — both claim orders run)
      val batchOf: Int => org.apache.spark.sql.Column = op match {
        case "minhash_dedup" =>
          val q = math.max(1, keys / 4)
          i => if (i == 3) col("doc_id") >= 3L * q
               else col("doc_id") >= i.toLong * q && col("doc_id") < (i + 1L) * q
        case _ =>
          require(perKey >= 4, s"perKey must be >= 4 to form 4 batches, got $perKey")
          val quarter = perKey / 4
          i => {
            val hi = if (i == 3) perKey else (i + 1) * quarter
            expr(s"event_id div $keys") >= i * quarter &&
              expr(s"event_id div $keys") < hi
          }
      }
      (0 until 4).foreach { i =>
        df.filter(batchOf(i))
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
        case "funnel" =>
          Streams.funnelOn(src).writeStream
            .format("parquet").option("path", out)
            .option("checkpointLocation", chk).outputMode("append")
        case "custom_state" =>
          Streams.customStateOn(src).writeStream
            .format("parquet").option("path", out)
            .option("checkpointLocation", chk).outputMode("append")
        case "minhash_dedup" =>
          Streams.minhashDedupOn(src).writeStream
            .format("parquet").option("path", out)
            .option("checkpointLocation", chk).outputMode("append")
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
      // per-batch attribution: where a tail batch's wall goes is part
      // of the receipt — output rows (sink emission), state rows
      // updated/removed (watermark-close work), and the state-store
      // commit share of the trigger, so "slower tail batch" can be
      // READ as emission-at-close vs lookup degradation instead of
      // asserted
      val detail = progress.map { p =>
        val so = p.stateOperators.headOption
        val commit = Option(p.durationMs.get("commitOffsets")).map(_.toLong).getOrElse(-1L)
        val add = Option(p.durationMs.get("addBatch")).map(_.toLong).getOrElse(-1L)
        s"out=${p.sink.numOutputRows} upd=${so.map(_.numRowsUpdated).getOrElse(-1L)} " +
          s"rm=${so.map(_.numRowsRemoved).getOrElse(-1L)} " +
          s"stateUpdateMs=${so.map(_.allUpdatesTimeMs).getOrElse(-1L)} " +
          s"stateCommitMs=${so.map(_.commitTimeMs).getOrElse(-1L)} " +
          s"addBatchMs=$add commitOffsetsMs=$commit"
      }
      println(
        f"[stress-streams] op=$op keys=$keys rows=${keys.toLong * perKey} " +
          f"batches=${batchMs.length} wall=$total%.2fs " +
          s"batch_ms=${batchMs.mkString("[", ",", "]")} " +
          s"state_rows=$stateRows state_bytes=$stateMem")
      detail.zipWithIndex.foreach { case (d, i) =>
        println(s"[stress-streams]   batch $i: $d")
      }
    }
    spark.stop()
  }
}
