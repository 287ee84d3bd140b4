// PACKAGE-INJECTED bridge — the one compilation unit in this repo that
// lives inside Spark's own namespace. Written against Spark 4.1.2,
// kept beside SparkInternals.scala so the entire internal-API surface
// of the connector sits in two adjacent, clearly-marked files.
package org.apache.spark.sql

/** Why this exists: a V1 streaming `Sink.addBatch` receives a Dataset
  * bound to the micro-batch's ALREADY-PLANNED incremental execution,
  * with the streaming flag still set on its logical plan. Every
  * public-API route to a writable batch frame re-analyzes that logical
  * plan as batch and is refused (`df.write` →
  * CALL_ON_STREAMING_DATASET_UNSUPPORTED; `df.rdd` → a fresh
  * QueryExecution → UnsupportedOperationChecker.checkForBatch), and
  * `collect()` would materialize the epoch on the driver. The
  * sanctioned zero-copy rebind — the exact call Spark's own
  * foreachBatch wrapper makes — is `internalCreateDataFrame(toRdd,
  * schema, isStreaming = false)`, which is `private[sql]`; this
  * package-local object re-exposes just that, nothing else.
  */
object GraftSqlBridge {

  /** The epoch's rows as a batch DataFrame: same RDD of InternalRows
    * (executor-side flow, no driver materialization, no row
    * re-encoding), batch-flagged logical plan.
    */
  def rebatch(data: DataFrame): DataFrame = {
    val session = data.sparkSession.asInstanceOf[classic.SparkSession]
    session.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }
}
