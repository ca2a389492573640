package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal `private[sql]` bridge: wrap a Catalyst [[Expression]] in a
  * [[Column]] (and back) without a function-registry round trip.
  *
  * Why it exists: most of the engine's native expressions are exposed
  * through stateless registry builders (`createOrReplaceTempFunction` +
  * `call_function`), which is safe because the builder closes over
  * nothing per-call. Expressions that capture PER-CALL state — the
  * bloom probe's `Broadcast[Array[Long]]` handle — cannot use a fixed
  * registry name without a lost-update hazard (two Columns built before
  * either is analyzed both resolve to the last registration), so they
  * construct the Column directly here. Spark 4 hides the
  * expression↔column conversion behind `private[sql]`
  * (`classic.ExpressionUtils`); this object is the one sanctioned
  * crossing point, kept deliberately tiny.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
