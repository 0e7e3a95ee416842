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

  /** SQL's `agg FILTER (WHERE cond)` for a typed-Aggregator UDAF (the DSL
    * has no spelling for it): rows failing `cond` skip this aggregate's
    * update, map-side partials included — so two complementary slices of
    * one table aggregate in a single scan + shuffle instead of one scan
    * per slice. Built directly as a filtered AggregateExpression because a
    * udaf-applied Column stays a lazy ColumnNode until analysis. */
  def aggFilter(agg: expressions.UserDefinedFunction, args: Seq[Column],
                cond: Column): Column = agg match {
    case uda: expressions.UserDefinedAggregator[_, _, _] =>
      val fn = execution.aggregate.ScalaAggregator(
        uda, args.map(expression).toSeq)
      column(fn.toAggregateExpression(isDistinct = false,
        filter = Some(expression(cond))))
    case other =>
      throw new IllegalArgumentException(
        s"aggFilter needs a UserDefinedAggregator, got ${other.getClass}")
  }
}
