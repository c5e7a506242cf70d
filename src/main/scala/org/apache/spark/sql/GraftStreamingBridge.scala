package org.apache.spark.sql

/** The one internal hook the V1 streaming Source contract needs: a batch
  * DataFrame handed back from `Source.getBatch` must carry
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only way
  * to stamp that onto an existing plan is `internalCreateDataFrame`, which
  * is `private[sql]`. This bridge lives in the `org.apache.spark.sql`
  * package solely to re-export it; no other internals are touched. The
  * wrapped plan is the original query's physical RDD, still lazy. */
object GraftStreamingBridge {
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse, for the V1 Sink contract: the DataFrame handed to
    * `Sink.addBatch` is streaming-tagged, so ordinary batch operations on
    * it (the engine's MERGE) would be rejected by the analyzer. Re-wrap
    * its physical RDD as a batch frame — the exact trick Spark's own
    * ForeachBatchSink uses. Still lazy; actions on the result re-run the
    * micro-batch's (deterministically replayable) incremental plan. */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
