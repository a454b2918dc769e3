package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

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
}
