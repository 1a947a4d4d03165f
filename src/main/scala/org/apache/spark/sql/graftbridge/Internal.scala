package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** The engine's ONE bridge into `private[sql]` Spark API, kept deliberately
  * tiny: wrap a catalyst expression as a user-facing Column. Needed for
  * scalar-subquery expressions ([[graft.operators.Prune.bloomSemi]] passes
  * a `ScalarSubquery` to `might_contain`, which the analyzer requires to
  * be constant-or-subquery — the DataFrame API has no public spelling for
  * that shape; Spark's own runtime-filter rule builds the identical tree
  * internally).
  */
object Internal {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def scalarSubquery(plan: LogicalPlan): Column =
    column(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(plan))
}
