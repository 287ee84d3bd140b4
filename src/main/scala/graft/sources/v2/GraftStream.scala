package graft.sources.v2

import graft.sources.Store

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, SupportsReportStatistics, SupportsRuntimeFiltering, Statistics => V2Statistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** The Scan served by [[GraftScanBuilder]]: batch reads delegate to
  * Spark's vectorized ParquetScan assembled over the bucket-PRUNED
  * roots (via [[SparkInternals]] — unchanged from the batch-only
  * vintage), and `toMicroBatchStream` makes the same table readable
  * with `spark.readStream.format("graft")` from any binding — the
  * DSv2 face of [[Store.readStream]].
  */
final class GraftScan(
    store: Store,
    key: String,
    required: StructType,
    pushed: Array[Filter],
    batchRoots: () => Seq[HPath],
    maxFilesPerTrigger: Option[Int] = None,
    staticBounds: (Option[java.sql.Timestamp], Option[java.sql.Timestamp]) = (None, None),
    runtimePrune: Option[(Option[java.sql.Timestamp], Option[java.sql.Timestamp]) => Seq[HPath]] = None
) extends Scan with SupportsReportStatistics with SupportsRuntimeFiltering {

  /** Roots override installed by a runtime (DPP) filter; when set, the
    * next assembly prunes by the TIGHTENED bounds.
    */
  @volatile private var runtimeRoots: Option[() => Seq[HPath]] = None
  private val parquetRef =
    new java.util.concurrent.atomic.AtomicReference[Scan](null)

  private def roots(): Seq[HPath] =
    runtimeRoots.map(_()).getOrElse(batchRoots())

  /** The batch parquet assembly, built on first batch use (a streaming
    * read never lists the batch roots) and REBUILT if a runtime filter
    * lands after it (Spark calls `filter(...)` then `toBatch` again —
    * verified against 4.1.2's BatchScanExec.filteredPartitions).
    * Public so plan-asserting specs can reach the pruned file index.
    */
  def parquet: Scan = {
    val cached = parquetRef.get()
    if (cached != null) cached
    else {
      val built = SparkInternals.parquetScanOver(
        SparkSession.active, roots(), store.schema, required, pushed)
      if (parquetRef.compareAndSet(null, built)) built else parquetRef.get()
    }
  }

  override def readSchema(): StructType = required

  // ---- runtime filtering (the DSv2 face of dynamic partition pruning)
  //
  // A join whose key is the index column gets its build-side values
  // pushed here at runtime as an In(idx, values) — the value envelope
  // [min, max] re-prunes the bucket dirs, so `events JOIN dims ON
  // events.TS = dims.day` scans only the days the dim side actually
  // holds. Pruning is a superset by construction (envelope, inclusive
  // bounds); the join itself keeps exactness.

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (runtimePrune.isDefined)
      Array(org.apache.spark.sql.connector.expressions.Expressions.column(store.indexName))
    else Array.empty

  override def filter(filters: Array[Filter]): Unit = runtimePrune.foreach { mk =>
    val (rs, re) = GraftBounds.tsBounds(filters.toIndexedSeq, store.indexName)
    if (rs.isDefined || re.isDefined) {
      val s2 = GraftBounds.later(staticBounds._1, rs)
      val e2 = GraftBounds.earlier(staticBounds._2, re)
      runtimeRoots = Some(() => mk(s2, e2))
      parquetRef.set(null) // the re-requested toBatch re-assembles pruned
    }
  }

  /** Planner-facing size estimate: bytes under the PRUNED roots (so a
    * range-sliced join side of a huge item reports its slice, not the
    * item), times the session's file-compression factor — the same
    * shape Spark's own FileScan reports. Without this, DSv2 relations
    * fall back to `spark.sql.defaultSizeInBytes` (Long.MaxValue): a
    * graft table could NEVER be statically chosen as the broadcast
    * side of a join, and at cluster scale the fact table pays a full
    * shuffle AQE can only partially claw back (the map-side write
    * still happens). Lazy-cached: one listing per scan — for a
    * streaming query (whose per-batch re-planning also consults it)
    * that is one listing at stream start, never per trigger.
    * Exceptions yield the unknown estimate — stats must never fail a
    * plan the scan itself could execute.
    */
  private lazy val stats: V2Statistics = {
    val size: java.util.OptionalLong =
      try {
        val factor = SparkSession.active.conf
          .getOption("spark.sql.sources.fileCompressionFactor")
          .map(_.toDouble).getOrElse(1.0)
        java.util.OptionalLong.of(
          math.max(1L, (store.bytesUnder(batchRoots()) * factor).toLong))
      } catch { case _: Exception => java.util.OptionalLong.empty() }
    new V2Statistics {
      override def sizeInBytes(): java.util.OptionalLong = size
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  }

  override def estimateStatistics(): V2Statistics = stats

  /** Static on purpose: delegating to the ParquetScan's description
    * would force the lazy batch assembly — a full bucket-dir LIST — on
    * any plan rendering (explain, progress reports), including for
    * streaming reads that never execute the batch side.
    */
  override def description(): String =
    s"GraftScan item=$key store=${store.base} " +
      s"pushed=[${pushed.mkString(", ")}] read=${required.fieldNames.mkString(",")}"

  override def toBatch: Batch = parquet.toBatch

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(store, key, required, maxFilesPerTrigger)
}

/** Offset = the sorted set of data files already processed, carried
  * IN the offset json itself. Self-contained by design: Spark's
  * restart contract requires `planInputPartitions(start, end)` to
  * reproduce a committed-but-unreplayed batch exactly, and a listing
  * taken at replay time could have drifted (an append landed, a
  * compaction rewrote files) — only the offset's own file list is
  * immune. The cost is O(files) json per offset; the store's
  * compaction keeps file counts at the chunk contract, and an item
  * whose file count outgrows offset-sized metadata should stream
  * through [[Store.readStream]] (Spark's file source with its
  * compacted seen-files log) instead — both paths are supported, this
  * one exists so non-Scala bindings have a streaming front door.
  */
final class GraftFilesOffset(val files: Seq[String]) extends Offset {
  override def json(): String =
    files.map(f =>
      "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

object GraftFilesOffset {
  /** Parse the json() form back; tolerates the empty list. */
  def parse(json: String): GraftFilesOffset = {
    val body = json.trim.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) new GraftFilesOffset(Nil)
    else new GraftFilesOffset(
      // split on "," boundaries between quoted strings; our paths are
      // store-layout paths (uuid part files under bucket dirs), so the
      // only escapes ever emitted are the two json() produces
      body.split("\",\\s*\"").toIndexedSeq
        .map(_.stripPrefix("\"").stripSuffix("\"")
          .replace("\\\"", "\"").replace("\\\\", "\\")))
  }
}

/** Micro-batch stream over one item: each trigger lists the item's
  * data files (one recursive LIST, same cost as a batch scan's
  * planning), and the new-since-last-offset files become the batch —
  * read by a per-batch ParquetScan assembled over exactly those files,
  * so the streaming reader reuses Spark's vectorized parquet path
  * end-to-end. Appends surface as new chunk files (the store never
  * edits a data file in place), so delta-only processing is exact.
  *
  * Caveat shared with [[Store.readStream]]: COMPACTION rewrites
  * history into new files, which a live streaming reader would re-see
  * as fresh input. Stream from items whose maintenance window is
  * coordinated, or reprocess-tolerant sinks (the store's own
  * [[Store.ingestStream]] sink is idempotent by appendNewOnly).
  */
object GraftMicroBatchStream {
  /** ~20k files ≈ 1.7 MiB of offset json per micro-batch (OffsetScale
    * receipt: 8.3 MiB at 100k files) — past this the checkpoint write
    * dominates small batches.
    */
  private[v2] val OffsetFileWarnThreshold: Int = 20000
}

final class GraftMicroBatchStream(
    store: Store,
    key: String,
    required: StructType,
    maxFilesPerTrigger: Option[Int]
) extends MicroBatchStream with SupportsTriggerAvailableNow {

  /** Factory is file-list-independent (FilePartitions carry their own
    * files), so ONE assembly over zero roots serves every batch.
    */
  private lazy val factory: PartitionReaderFactory =
    SparkInternals.parquetScanOver(
      SparkSession.active, Nil, store.schema, required, Array.empty)
      .toBatch.createReaderFactory()

  /** Under Trigger.AvailableNow, the run's END is pinned at start —
    * the drive processes exactly the files that existed then (in
    * `maxFilesPerTrigger`-sized batches if set) and terminates, even
    * while appends keep landing.
    */
  @volatile private var availableNowTarget: Seq[String] = _

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = store.dataFiles(key)

  private def listing(): Seq[String] =
    if (availableNowTarget != null) availableNowTarget
    else store.dataFiles(key)

  override def initialOffset(): Offset = new GraftFilesOffset(Nil)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled entry point")

  /** `maxFilesPerTrigger` is the 24/7 scale knob: without it, the
    * FIRST micro-batch of a stream started against a large item would
    * be the entire item. The option caps each batch's admission; the
    * stream still converges on all files (the next batch starts where
    * this one ended).
    */
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** One-time warning once the cumulative file list stops being
    * offset-sized metadata: every micro-batch serializes the FULL list
    * into the checkpoint offset log (the restart-exactness tradeoff
    * documented on [[GraftFilesOffset]]), so a long-lived stream over a
    * growing item degrades steadily and silently without this.
    */
  private val warnedOffsetScale = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def warnIfOffsetHeavy(n: Int): Unit =
    if (n > GraftMicroBatchStream.OffsetFileWarnThreshold &&
        warnedOffsetScale.compareAndSet(false, true))
      org.slf4j.LoggerFactory.getLogger(classOf[GraftMicroBatchStream]).warn(
        s"graft stream over ${store.base}/$key now tracks $n files per " +
          "checkpoint offset (~" + (n / 12288 + 1) + " MiB of offset json " +
          "per micro-batch). Compact the item (Store.compactBuckets / " +
          "CALL <cat>.compact_buckets) to shrink the list, or stream via " +
          "Store.readStream (Spark's file source with a compacted " +
          "seen-files log) for indefinitely-growing items.")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = start.asInstanceOf[GraftFilesOffset].files.toSet
    val fresh = listing().filterNot(seen)
    val admitted = limit match {
      case mf: ReadMaxFiles => fresh.take(mf.maxFiles())
      case _ => fresh
    }
    val next = (seen ++ admitted).toSeq.sorted
    warnIfOffsetHeavy(next.size)
    new GraftFilesOffset(next)
  }

  override def reportLatestOffset(): Offset = new GraftFilesOffset(listing())

  override def deserializeOffset(json: String): Offset =
    GraftFilesOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[GraftFilesOffset].files.toSet
    val fresh = end.asInstanceOf[GraftFilesOffset].files.filterNot(seen)
    if (fresh.isEmpty) Array.empty
    else SparkInternals.parquetScanOver(
      SparkSession.active, fresh.map(new HPath(_)), store.schema, required,
      Array.empty).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory = factory

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
