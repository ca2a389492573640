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
}
