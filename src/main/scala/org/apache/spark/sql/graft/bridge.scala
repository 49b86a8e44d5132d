package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Spark internals needed to expose custom
  * Catalyst `Expression`s as user-facing `Column`s in Spark 4 (where
  * `Column` wraps a ColumnNode rather than an Expression). Kept to the
  * minimum surface: Column <-> Expression and function registration.
  */
object SparkInternals {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry

  /** Applies an extensions object's function injections to an EXISTING
    * session's registry (normally they only bind at builder time via
    * spark.sql.extensions). */
  def applyFunctionInjections(ext: org.apache.spark.sql.SparkSessionExtensions,
                              spark: SparkSession): Unit =
    ext.registerFunctions(functionRegistry(spark))

  /** Analyzed logical plan of a DataFrame (queryExecution lives on the
    * classic Dataset in Spark 4) — used to embed a one-row aggregate as
    * a scalar subquery (BloomPrune). */
  def analyzedPlan(df: org.apache.spark.sql.Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** Frees the block-manager storage behind a locally-checkpointed
    * DataFrame (Dataset.localCheckpoint persists an internal RDD the
    * public Dataset API offers no way to release). No-op for any other
    * plan shape. Only call on generations no consumer can still need —
    * a local checkpoint has no lineage to recompute from. */
  def uncheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    analyzedPlan(df).collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ =>
    }

  /** Wraps a logical plan back into a DataFrame (Dataset.ofRows is
    * private[sql]) — used by specs to evaluate a manually-rewritten
    * plan. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
