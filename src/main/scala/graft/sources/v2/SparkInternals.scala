package graft.sources.v2

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

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
