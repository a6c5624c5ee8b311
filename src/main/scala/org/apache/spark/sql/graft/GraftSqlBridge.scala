package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge into the `org.apache.spark.sql` package namespace:
  * constructing a DataFrame from a custom LogicalPlan goes through
  * `Dataset.ofRows`, which is `private[sql]`. This is the standard
  * extension-library pattern (a one-method accessor, no copied code) —
  * everything else in this repo stays on public API.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Canonicalize -0.0/0.0 and NaN bit patterns in an expression used
    * as a grouping/join key (no-op for non-floating types). Spark's
    * NormalizeFloatingNumbers rule covers built-in Aggregate/Join/
    * Window nodes but not custom operators, which must apply it
    * themselves. */
  def normalizeFloats(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
