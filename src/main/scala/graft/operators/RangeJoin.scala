package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ColUtil.floorDiv

/** Pure range joins (no shared equi-key) at scale.
  *
  * `events.ts BETWEEN range.start AND range.end` with no equi-key
  * forces Spark into BroadcastNestedLoopJoin — O(|events| · |ranges|)
  * comparisons. Fine for 25 ranges; fatal for a million (calendar
  * slots, maintenance windows, ad campaigns, flight phases). The
  * standard fix is BINNING: quantize time into fixed-width buckets,
  * replicate each range onto every bucket it overlaps, tag each event
  * with its single bucket, equi-join on the bucket, then apply the
  * exact predicate. Cost becomes |events| + |ranges| · span/bin
  * through one hash-partitioned equi-join — shuffle-parallel, AQE-
  * and skew-handling-eligible, everything a nested loop is not.
  */
object RangeJoin {

  /** Events-to-ranges inner join on `tsUs ∈ [startUs, endUs)` via
    * bucket equi-join. Every output row appears EXACTLY once (an
    * event lives in one bucket; a range's replica in that bucket is
    * unique), so no post-join dedup is needed — the property that
    * makes this a drop-in for the naive join. Empty ranges
    * (`endUs <= startUs`) match nothing, exactly like the naive
    * predicate. `binUs` trades replication (wide ranges × narrow
    * bins) against residual filtering (narrow ranges × wide bins);
    * pick it near the median range width — or pass `binUs = 0` and
    * the operator derives exactly that default itself (see
    * [[medianRangeWidth]]). Bucket assignment is exact integer floor
    * division ([[graft.functions.ColUtil.floorDiv]]) — correct for
    * arbitrary 64-bit microsecond values, not just |ts| < 2^53. */
  def binnedRangeJoin(events: DataFrame, tsUs: String, ranges: DataFrame,
                      startUs: String, endUs: String, binUs: Long): DataFrame = {
    require(binUs >= 0, "binUs must be positive (or 0 to derive from stats)")
    val bin = if (binUs > 0) binUs else medianRangeWidth(ranges, startUs, endUs)
    val e = events.withColumn("__bin", floorDiv(col(tsUs), bin))
    val r = ranges.filter(col(endUs) > col(startUs))
      .withColumn("__bin", explode(sequence(
        floorDiv(col(startUs), bin),
        floorDiv(col(endUs) - 1, bin))))
    e.join(r, Seq("__bin"))
      .filter(col(tsUs) >= col(startUs) && col(tsUs) < col(endUs))
      .drop("__bin")
  }

  /** The stats-driven `binUs` default: the approximate median range
    * width, from ONE cheap aggregation over the (small relative to
    * events) ranges side — a bin near the median width keeps both
    * costs linear: a typical range replicates onto ~2 buckets, and a
    * bucket's residual filter sees ~1 bin of events. One bounded
    * driver-side collect of a single row (the q9 scalar-subquery
    * economics); `approx_percentile` is a fixed-size sketch, never a
    * sort. Empty/degenerate range inputs fall back to one second. */
  def medianRangeWidth(ranges: DataFrame, startUs: String,
                       endUs: String): Long = {
    val row = ranges.filter(col(endUs) > col(startUs))
      .agg(percentile_approx((col(endUs) - col(startUs)).cast("long"),
        lit(0.5), lit(10000)).as("m"))
      .head()
    if (row.isNullAt(0)) 1000000L else math.max(row.getLong(0), 1L)
  }
}
