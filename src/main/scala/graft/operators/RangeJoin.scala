package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * pick it near the median range width. */
  def binnedRangeJoin(events: DataFrame, tsUs: String, ranges: DataFrame,
                      startUs: String, endUs: String, binUs: Long): DataFrame = {
    require(binUs > 0, "binUs must be positive")
    val e = events.withColumn("__bin", floor(col(tsUs) / binUs).cast("long"))
    val r = ranges.filter(col(endUs) > col(startUs))
      .withColumn("__bin", explode(sequence(
        floor(col(startUs) / binUs).cast("long"),
        floor((col(endUs) - 1) / binUs).cast("long"))))
    e.join(r, Seq("__bin"))
      .filter(col(tsUs) >= col(startUs) && col(tsUs) < col(endUs))
      .drop("__bin")
  }
}
