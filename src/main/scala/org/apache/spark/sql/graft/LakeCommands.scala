package org.apache.spark.sql.graft

import graft.operators.MergeTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

/** `MERGE INTO graft.<ns>.<table> …` as an eagerly-executed command
  * (the SQL-text face of [[graft.operators.MergeTable.merge]]).
  *
  * Lives in the `org.apache.spark.sql` namespace because
  * `LeafRunnableCommand` and `Dataset.ofRows` are `private[sql]` — the
  * same one-hop shim pattern as [[Bridge]]. The command holds the
  * RESOLVED source plan as a field (not a child): it is only ever
  * constructed by the resolution rule after the source subtree is fully
  * resolved, and commands execute eagerly right after analysis, so the
  * optimizer never needs to see into the source from here (merge itself
  * plans the batch when it executes it).
  *
  * Returns the committed version as a one-row result — the SQL user's
  * receipt, mirroring the Long the API returns. */
case class GraftMergeIntoCommand(
    root: String,
    key: String,
    deleteCol: Option[String],
    source: LogicalPlan) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val classic = sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val batch = Dataset.ofRows(classic, source)
    val v = MergeTable.merge(classic, root, batch, key, deleteCol)
    Seq(Row(v))
  }
}
