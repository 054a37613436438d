package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** LogicalPlan ⇄ DataFrame bridge. A library that ships a custom
  * logical operator (graft.plans.AsOfJoin) must wrap it back into a
  * user-facing DataFrame; the constructor for that —
  * `classic.Dataset.ofRows` — is `private[sql]` in Spark 4, so this
  * one-file shim lives in the `org.apache.spark.sql` namespace, the
  * same pattern Spark connector/extension libraries use (see
  * ColumnBridge for the Column ⇄ Expression twin).
  */
object PlanBridge {
  /** Wrap a logical plan into a DataFrame (runs the analyzer). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan backing a Dataset. */
  def analyzed(ds: Dataset[_]): LogicalPlan = ds.queryExecution.analyzed
}
