package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Bridge for V1 streaming sources ([[org.apache.spark.sql.execution.streaming.Source]]):
  * `getBatch` must hand the engine a STREAMING DataFrame, but the natural
  * way to build a batch from committed files is the plain batch reader.
  * The file-source pattern (FileStreamSource) marks the leaf relations
  * streaming and rebuilds the Dataset; the constructor for that lives
  * behind `private[sql]`, hence this shim package. */
object StreamBridge {
  def asStreaming(df: DataFrame): DataFrame = {
    val sess = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
      case loc: LocalRelation if !loc.isStreaming => loc.copy(isStreaming = true)
      // RDD-backed batches (the change-feed snapshot batch rebases its
      // DV-fold join onto an RDD lineage so it plans as a batch join)
      case rdd: org.apache.spark.sql.execution.LogicalRDD if !rdd.isStreaming =>
        new org.apache.spark.sql.execution.LogicalRDD(
          rdd.output, rdd.rdd, rdd.outputPartitioning, rdd.outputOrdering,
          true, rdd.stream)(sess, None, None)
    }
    org.apache.spark.sql.classic.Dataset.ofRows(sess, plan)
  }

  /** Rebase `df` onto its own INTERNAL-row lineage as a streaming frame —
    * the snapshot-batch path: `LogicalRDD.fromDataset(queryExecution.toRdd)`
    * keeps the rows in Tungsten format end to end, where
    * `createDataFrame(df.rdd, schema)` would round-trip every row
    * InternalRow→Row→InternalRow through the encoder — roughly doubling
    * the CPU cost of what is by construction the stream's largest batch.
    * The RDD lineage still hides the DV-fold anti-join from the streaming
    * planner (it plans as a batch join inside the leaf), and `toRdd` is
    * lazy — nothing executes or materializes here. */
  def internalAsStreaming(df: DataFrame): DataFrame = {
    val sess = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val plan = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      df.queryExecution.toRdd, ds, isStreaming = true)
    org.apache.spark.sql.classic.Dataset.ofRows(sess, plan)
  }
}
