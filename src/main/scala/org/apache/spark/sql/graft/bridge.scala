package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression converters
  * (the classic-mode API in Spark 4 hides them; extension libraries bridge
  * from inside the package — same pattern as Delta/Sedona). Nothing else
  * from private API is touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions' injected functions onto a live
    * registry (`registerFunctions` is private[sql]); lets tests exercise
    * the GraftExtensions injection without building a fresh SparkContext. */
  def applyFunctionExtensions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    ext.registerFunctions(reg)

  /** Execute a LogicalPlan as a DataFrame (`Dataset.ofRows` is
    * private[sql]); lets tests run a rule-rewritten plan and compare
    * results against the original. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
