package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x removed the public `new Column(expr)` constructor; the
  * supported internal bridge is `classic.ExpressionUtils`, which is
  * `private[sql]`. This object lives under `org.apache.spark.sql` purely
  * to re-export that bridge to the graft engine (no Spark internals are
  * modified). Used to expose custom Catalyst expressions (dot product,
  * MaxSim, MinHash — see graft.functions) as `Column`s.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
