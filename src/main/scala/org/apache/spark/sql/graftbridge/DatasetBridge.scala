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

  /** The checkpoint/scan RDDs a DataFrame's plan is rooted on (leaves
    * created via [[internalDf]]) — the handles to unpersist when the
    * frame is evicted. */
  def backingRdds(df: DataFrame): Seq[RDD[InternalRow]] =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }
}
