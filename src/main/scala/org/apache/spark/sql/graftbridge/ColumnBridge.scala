/** Bridge into Spark's `private[sql]` Column <-> Expression converters.
  * Spark 4 made `Column` wrap a `ColumnNode` instead of an `Expression`;
  * `org.apache.spark.sql.classic.ExpressionUtils` is the supported internal
  * adapter, scoped `private[sql]`, hence this package-located shim — the
  * standard pattern for libraries that define custom Catalyst expressions.
  */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Non-blocking read of an [[org.apache.spark.sql.Observation]]'s
    * metrics (`getOrEmpty` is `private[sql]`; the public `get` blocks
    * with no timeout, which a caller that needs a fallback can't risk).
    */
  def observedOrEmpty(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getOrEmpty
}
