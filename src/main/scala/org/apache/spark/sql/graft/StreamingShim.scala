package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/** The ONE Spark-internal call the engine makes, isolated here.
  *
  * A v1 streaming [[org.apache.spark.sql.execution.streaming.Source]] must
  * return micro-batch DataFrames whose logical plan is flagged
  * `isStreaming = true` (MicroBatchExecution asserts it — "did not have
  * isStreaming=true"), and the only way to stamp the flag is the
  * `private[sql]` `SparkSession.internalCreateDataFrame(rdd, schema,
  * isStreaming)`. Every v1 source inside Spark (Kafka, file) calls exactly
  * this; third-party v1 connectors reach it the same way this file does —
  * a shim object inside the `org.apache.spark.sql` namespace.
  *
  * Semantically this is also the RIGHT boundary for the graft changelog
  * source: the window query (parquet scans + offset-window filters + the
  * per-key LWW winner fold) compiles here into a single batch-planned
  * RDD[InternalRow] — Catalyst plans it with pushed filters and a plain
  * batch HashAggregate — and the streaming side sees only an opaque
  * streaming leaf. Were the plan itself marked streaming, the incremental
  * planner would try to turn the winner fold into a STATEFUL streaming
  * aggregation (state store, output-mode rules) — wrong semantics for a
  * window that is already complete when the batch is cut. Laziness is
  * preserved: `queryExecution.toRdd` builds the RDD without running a job;
  * the batch executes when the sink consumes it.
  */
object StreamingShim {

  /** Re-root `df`'s (batch) plan as a streaming-flagged leaf with the same
    * schema, for return from `Source.getBatch`. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}
