package graft.sources.v2

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Implements the V1 `StreamSinkProvider` contract on behalf of the
  * provider: the interface itself is public
  * (`org.apache.spark.sql.sources`), but its `createSink` RETURN TYPE
  * is the internal `Sink` trait — so the override lives here in the
  * quarantine file, and [[GraftDataSource]] implements only the
  * public-typed [[resolveSink]] template.
  */
private[v2] trait GraftSinkProviderBase
    extends org.apache.spark.sql.sources.StreamSinkProvider {

  /** Resolve (store, key, per-epoch ingest fn) from sink parameters —
    * the public-API half, implemented by the provider.
    */
  protected def resolveSink(
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : (graft.sources.Store, String, org.apache.spark.sql.DataFrame => Unit)

  final override def createSink(
      sqlContext: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val (store, key, onBatch) = resolveSink(parameters, partitionColumns, outputMode)
    SparkInternals.graftSink(store, key, onBatch)
  }
}

/** The ONE deliberate crossing into Spark-INTERNAL API in the `v2`
  * package, quarantined so a Spark version bump breaks exactly this
  * file. Written against **Spark 4.1.2**; the internal touchpoints
  * and why each is worth the coupling:
  *
  *  1. `org.apache.spark.sql.classic.SparkSession` — the Spark-4
  *     split moved the concrete session behind the `classic` package;
  *     `InMemoryFileIndex`/`ParquetScan` constructors require it, and
  *     the public `SparkSession` the connector API hands us IS one
  *     (single-JVM deployments; Spark Connect would need a different
  *     front door entirely).
  *  2. `InMemoryFileIndex` — the pruning decision: building the file
  *     index over ONLY the in-range bucket directories is the entire
  *     point of the provider, and there is no public-API way to hand
  *     a DSv2 `ParquetScan` a restricted root set.
  *  3. `ParquetScan` — delegating to Spark's own scan buys the
  *     vectorized reader, row-group statistics pushdown, split
  *     planning, and whole-stage-codegen compatibility; reimplementing
  *     a parquet reader on the public API would lose all four.
  *
  * No `FileStatusCache` is passed (default = NoopCache): every scan
  * LISTs fresh, because items are APPEND-ABLE and a shared cache could
  * serve a pre-append listing and silently drop the newest rows. The
  * listing is already bounded by bucket pruning, so freshness costs
  * one LIST of only the in-range directories.
  */
private[v2] object SparkInternals {

  /** The V1 streaming `Sink` trait (4th internal touchpoint, same
    * version contract): `addBatch(epochId, df)` hands the sink each
    * micro-batch as a driver-side DataFrame — exactly the shape the
    * store's idempotent `appendNewOnly` ingest wants, and the same
    * epoch contract `Store.ingestStream`'s foreachBatch uses. The DSv2
    * `StreamingWrite` API would instead demand executor-side row
    * writers plus a driver commit, i.e. re-implementing parquet task
    * writing that `appendNewOnly` already does right (staged,
    * manifest-marked, anti-join-deduped). Replayed epochs append zero
    * rows by the anti-join, so exactly-once lands without any sink-side
    * epoch bookkeeping.
    */
  def graftSink(
      store: graft.sources.Store, key: String,
      onBatch: org.apache.spark.sql.DataFrame => Unit)
      : org.apache.spark.sql.execution.streaming.Sink =
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(
          batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
        // the handed Dataset is bound to the micro-batch's incremental
        // execution and still flagged ISTREAMING — both `data.write`
        // and `data.rdd` re-analyze it as batch and are refused.
        // GraftSqlBridge.rebatch (the package-injected neighbor file)
        // performs the zero-copy rebind foreachBatch itself uses:
        // same InternalRow RDD, batch-flagged plan, executor-side
        // flow, no driver materialization.
        onBatch(org.apache.spark.sql.GraftSqlBridge.rebatch(data))
      }
      override def toString: String = s"GraftSink(${store.base}/$key)"
    }

  /** Assemble Spark's vectorized parquet scan over an explicit,
    * already-pruned set of directory roots.
    */
  def parquetScanOver(
      spark: SparkSession,
      roots: Seq[HPath],
      dataSchema: StructType,
      readDataSchema: StructType,
      pushedFilters: Array[Filter]): Scan = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fileIndex = new InMemoryFileIndex(
      classic,
      roots.toIndexedSeq,
      Map.empty[String, String],
      Some(dataSchema))
    ParquetScan(
      classic,
      classic.sessionState.newHadoopConf(),
      fileIndex,
      dataSchema = dataSchema,
      readDataSchema = readDataSchema,
      readPartitionSchema = new StructType(),
      pushedFilters = pushedFilters,
      options = new CaseInsensitiveStringMap(
        java.util.Collections.emptyMap[String, String]()))
  }
}
