package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression converters.
  *
  * Spark 4 removed the public `new Column(expr)` constructor; the classic
  * (non-connect) path goes through `org.apache.spark.sql.classic.ExpressionUtils`.
  * Living under `org.apache.spark.sql.*` grants access. Used by graft's custom
  * Catalyst expressions (e.g. [[graft.functions.DotProduct]]).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
