package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's private[sql] streaming internals, as thin as
  * [[ColumnBridge]]. Two hops the V1 streaming source contract needs:
  * marking a batch DataFrame `isStreaming` (the documented requirement
  * on `Source.getBatch` return values), and constructing the V1
  * `StreamingRelation` the analyzer rule hangs off
  * `StreamingRelationV2.v1Relation` so `spark.readStream.table(...)`
  * on a capability-less v2 table falls back to the engine's source. */
object StreamBridge {

  /** Re-wrap `df`'s physical rows as a STREAMING DataFrame — the shape
    * `Source.getBatch` must return so MicroBatchExecution can splice it
    * into the streaming plan (a plain batch frame fails its
    * isStreaming assertion). Lazy: the RDD plans when the batch runs. */
  def asStreaming(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[
      org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** The inverse of [[asStreaming]], for a V1 `Sink.addBatch`: re-wrap
    * the micro-batch's physical rows as a BATCH DataFrame the sink can
    * put through ordinary writers (using the incremental plan's
    * DataFrame directly would re-analyze it as a streaming relation) —
    * the same hop `ForeachBatchSink` performs. */
  def asBatch(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[
      org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }

  /** The RUNNING streaming query's id, from the local property
    * `StreamExecution` stamps on its micro-batch thread — the stable
    * identity (constant across restarts of one checkpoint) the sink's
    * per-query transaction ledger keys on. */
  def currentQueryId(spark: SparkSession): Option[String] =
    Option(spark.sparkContext.getLocalProperty(
      org.apache.spark.sql.execution.streaming.runtime
        .StreamExecution.QUERY_ID_KEY))

  /** A V1 `StreamingRelation` over `providerClass` (a
    * `StreamSourceProvider`), with the CALLER's output attributes so
    * references bound to the v2 relation stay valid through the
    * fallback swap. */
  def v1StreamingRelation(spark: SparkSession, providerClass: String,
      sourceName: String, options: Map[String, String],
      schema: StructType, output: Seq[Attribute]): LogicalPlan = {
    val ds = org.apache.spark.sql.execution.datasources.DataSource(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      className = providerClass,
      userSpecifiedSchema = Some(schema),
      options = options)
    org.apache.spark.sql.execution.streaming.runtime.StreamingRelation(
      ds, sourceName, output)
  }
}
