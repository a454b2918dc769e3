package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Column⇄Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made `ExpressionUtils` `private[sql]` (Column no longer wraps an
  * Expression publicly since the Connect refactor); placing this shim under
  * `org.apache.spark.sql` is the conventional extension-library pattern for
  * exposing native expressions as `Column`s.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A full conf/state copy of `spark` whose SQL confs can be mutated
    * without touching the parent — the scoped alternative to toggling a
    * session-global conf around one job (`cloneSession` is
    * `private[sql]`, hence exposed here). Shares SparkContext, shared
    * state, and the cache manager with the parent. */
  def isolatedSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Re-bind a logical plan to (an isolated clone of) a session —
    * execution then reads THAT session's SQL confs. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Executor-shippable Hadoop configuration: `hadoopConfiguration`
    * itself is not serializable and Spark's `SerializableConfiguration`
    * wrapper is `private[spark]` — this carrier ships the driver's conf
    * into task closures so executor-side code can open Hadoop
    * `FileSystem` streams (ranged reads on HDFS/S3/local) with the
    * session's actual filesystem settings. */
  final class HadoopConf private[graft] (spark: SparkSession)
      extends Serializable {
    private val ser = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    def value: org.apache.hadoop.conf.Configuration = ser.value
  }

  def hadoopConf(spark: SparkSession): HadoopConf = new HadoopConf(spark)
}
