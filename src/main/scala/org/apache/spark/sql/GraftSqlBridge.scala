package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Two `private[sql]` re-exports the SQL DML commands need (the DML twin of
  * [[GraftStreamingBridge]]; same rule — re-export only, no internals
  * touched):
  *
  *   - parser [[Expression]]s (a WHERE condition, a SET value) must become
  *     [[Column]]s so they can resolve BY NAME against the live table frame
  *     at execution time — `ExpressionUtils.column` is the sanctioned
  *     wrapper (it is what the classic DSL itself uses);
  *   - a raw parsed [[LogicalPlan]] (a MERGE source subquery) must become a
  *     [[DataFrame]] so the normal analyzer — including the icelite
  *     resolution rule, for sources that read `ice.*` tables — runs over
  *     it: `Dataset.ofRows`.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def dataFrameOf(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
