package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.StructType

/** InternalRow-RDD ↔ DataFrame bridge (Spark 4 keeps
  * `internalCreateDataFrame` behind `private[sql]`). Used for RDD-level
  * checkpointing where the caller must keep a releasable handle on the
  * checkpoint storage — `Dataset.localCheckpoint` hides its persisted
  * RDD, so superseded iteration rounds could never be unpersisted.
  */
object DatasetBridge {
  /** Wrap an InternalRow RDD (e.g. a local checkpoint) as a DataFrame. */
  def internalDf(spark: SparkSession, rdd: RDD[InternalRow],
                 schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Wrap an InternalRow RDD as a STREAMING DataFrame — the V1
    * streaming `Source.getBatch` contract (micro-batch frames must be
    * isStreaming; the flag is only settable through the private
    * constructor this bridges). */
  def streamingDf(spark: SparkSession, rdd: RDD[InternalRow],
                  schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Wrap an analyzed LogicalPlan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — lets an extension rule hand a statement's
    * resolved source subtree to an engine operator as a frame. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Stable unique id of a classic session (`sessionUUID` is
    * `private[sql]` in Spark 4) — cache keys collide/recycle with
    * `System.identityHashCode`, a UUID never does. */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID

  /** The checkpoint/scan RDDs a DataFrame's plan is rooted on (leaves
    * created via [[internalDf]]) — the handles to unpersist when the
    * frame is evicted. */
  def backingRdds(df: DataFrame): Seq[RDD[InternalRow]] =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }

  /** Release ALL storage behind an iteration-round RDD: executor blocks
    * (unpersist) and, for reliably-checkpointed rounds, the checkpoint
    * files on disk — without this, each superseded round's files
    * accumulate in the checkpoint dir for the JVM's life. */
  def releaseRdd(rdd: RDD[_]): Unit = {
    rdd.unpersist(blocking = false)
    rdd.getCheckpointFile.foreach { p =>
      try {
        val path = new org.apache.hadoop.fs.Path(p)
        path.getFileSystem(rdd.context.hadoopConfiguration)
          .delete(path, true): Unit
      } catch { case _: java.io.IOException => () }
    }
  }
}
