package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge for the V1 streaming Source contract. A V1 `getBatch` must
  * return a DataFrame whose logical plan carries `isStreaming = true`
  * (MicroBatchExecution asserts it before splicing the plan into the
  * micro-batch); the only constructor for that flag on an arbitrary
  * computed plan is `SparkSession.internalCreateDataFrame(rdd, schema,
  * isStreaming = true)`, which Spark keeps `private[sql]`. Same
  * technique as [[ColumnBridge]]: re-export from inside the sql
  * package namespace — Delta's streaming source calls the identical
  * API from its own sql-package shim. */
object StreamBridge {
  /** The computed rows of `df` as a streaming-flagged DataFrame: the
    * physical plan is compiled here (driver-side, once per
    * micro-batch) and executes when the engine runs the batch. */
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val rdd: RDD[InternalRow] = df.queryExecution.toRdd
    val schema: StructType = df.schema
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
  }
}
