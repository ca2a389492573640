package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression utilities. */
object ColUtil {

  /** Let-binding for Column expressions: evaluate `value` exactly once
    * per row regardless of how many times `body` references it.
    *
    * Column trees have no sharing — referencing a sub-expression twice
    * duplicates its evaluation, and optimizer rules (CollapseProject,
    * predicate pushdown) can silently inline a projection-level alias
    * back into many use sites. For an expensive array-valued `value`
    * referenced per-element inside a higher-order function, that turns
    * O(n) plans into O(n²) (measured 100× on the MinHash shingle
    * pipeline). Binding through a single-element `transform` makes the
    * value a lambda variable — evaluated once, immune to inlining. */
  def bindOnce(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)

  /** Exact floor division of a BIGINT column by a positive constant —
    * the time-bucket assignment primitive (ADVICE r10: `floor(ts /
    * bin)` routes through DOUBLE division, which mis-bins once
    * |ts|/bin quotients leave double precision, ~2^53; arbitrary
    * 64-bit timestamps exceed that).
    *
    * `(a - pmod(a, b)) div b`: the numerator is exactly divisible by
    * `b`, so the integral division is exact at any magnitude, and
    * `pmod`'s non-negative remainder makes the result a true FLOOR
    * (rounds toward -inf) for negative `a` too — matching the old
    * double `floor` semantics bit-for-bit inside its valid range.
    * Pure long arithmetic, codegen'd (IntegralDivide). Only
    * precondition: `a - pmod(a, b)` must not underflow, i.e. `a ≥
    * Long.MinValue + b` — b is a bucket width, so the edge sits at
    * the representable-time boundary itself. */
  def floorDiv(a: Column, b: Long): Column = {
    require(b > 0, s"floorDiv needs a positive divisor, got $b")
    val exact = a.cast("long") - pmod(a.cast("long"), lit(b))
    org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(exact),
        org.apache.spark.sql.GraftColumnBridge.expression(lit(b))))
  }
}
