package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the Column ↔ Expression bridge `private[sql]`
  * (`classic.ExpressionUtils`). Extension libraries that ship native
  * Catalyst expressions need exactly these two hops — this shim exposes
  * them, nothing more. (The standard approach used by Spark-native
  * libraries; no Spark internals are modified.) */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
