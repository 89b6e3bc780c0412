package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's native Catalyst expressions and the public
  * Column API (Spark 4 moved the Column(expr) constructor behind
  * private[sql] ExpressionUtils). Lives in the org.apache.spark.sql
  * package purely to re-export those two conversions; no Spark behavior
  * is modified. Using direct Column construction (instead of the
  * session FunctionRegistry) keeps expression-backed helper Columns
  * session-independent — important for code paths that build Columns
  * without a session at hand (PartitionInvarianceSpec runs the same
  * query on sibling sessions whose temp-function registries differ). */
object GraftExprShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
