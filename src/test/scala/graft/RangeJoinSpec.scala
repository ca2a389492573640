package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Binned pure range join (q88): result-equivalence with the naive
  * inequality join on adversarial boundaries, and the plan property
  * the operator exists for — an equi-join, never a nested loop. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // bin width 100; ranges chosen to hit every edge case:
  //   r0 spans many bins; r1 narrower than one bin; r2 bin-aligned;
  //   r3 empty (end == start); r4 inverted (end < start); r5 overlaps r0
  private val ranges = Seq(
    (0L, 50L, 450L), (1L, 120L, 130L), (2L, 200L, 300L),
    (3L, 500L, 500L), (4L, 700L, 600L), (5L, 40L, 160L))
    .toDF("range_id", "start_us", "end_us")

  // events at boundaries: starts (inclusive), ends (exclusive),
  // bin edges, and far outside everything
  private val events = Seq(50L, 119L, 120L, 129L, 130L, 199L, 200L,
    299L, 300L, 449L, 450L, 100L, 400L, 500L, 650L, 9999L)
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("event_id", "ts_us")

  test("binned join equals the naive inequality join on every boundary case") {
    val binned = RangeJoin.binnedRangeJoin(events, "ts_us", ranges,
      "start_us", "end_us", binUs = 100L)
    val naive = events.crossJoin(ranges)
      .filter($"ts_us" >= $"start_us" && $"ts_us" < $"end_us")
    val cols = Seq($"event_id", $"range_id")
    assert(binned.select(cols: _*).exceptAll(naive.select(cols: _*)).isEmpty &&
      naive.select(cols: _*).exceptAll(binned.select(cols: _*)).isEmpty,
      "binning must be result-invisible")
    // exactly-once: no pair may appear twice (an event has ONE bin)
    assert(binned.groupBy("event_id", "range_id").count()
      .filter($"count" > 1).isEmpty)
    // the empty and inverted ranges match nothing
    assert(binned.filter($"range_id" >= 3 && $"range_id" <= 4).isEmpty)
  }

  test("plans as a bucket equi-join, not a nested loop") {
    val plan = RangeJoin.binnedRangeJoin(events, "ts_us", ranges,
      "start_us", "end_us", binUs = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"binned range join must not nested-loop:\n${plan.take(3000)}")
    assert(plan.contains("__bin"), "join must key on the bucket")
  }

  test("binUs = 0 derives a median-width bin and stays result-identical") {
    // median width of the non-empty ranges (400, 10, 100, 120) -> ~110
    val m = RangeJoin.medianRangeWidth(ranges, "start_us", "end_us")
    assert(m >= 10L && m <= 400L, s"derived bin $m outside the width range")
    val derived = RangeJoin.binnedRangeJoin(events, "ts_us", ranges,
      "start_us", "end_us", binUs = 0L)
    val naive = events.crossJoin(ranges)
      .filter($"ts_us" >= $"start_us" && $"ts_us" < $"end_us")
    val cols = Seq($"event_id", $"range_id")
    assert(derived.select(cols: _*).exceptAll(naive.select(cols: _*)).isEmpty &&
      naive.select(cols: _*).exceptAll(derived.select(cols: _*)).isEmpty,
      "derived-bin join must be result-invisible too")
    // degenerate ranges side: falls back to 1s, never 0 or negative
    val empty = Seq((0L, 5L, 5L)).toDF("range_id", "start_us", "end_us")
    assert(RangeJoin.medianRangeWidth(empty, "start_us", "end_us") == 1000000L)
  }

  test("bucket assignment is exact past double precision (2^53) and for negatives") {
    // |ts| ~ 2^62: double floor(ts/bin) mis-bins here; floorDiv must not
    val big = 1L << 62
    val r = Seq((0L, big, big + 1000L), (1L, -big - 1000L, -big))
      .toDF("range_id", "start_us", "end_us")
    val e = Seq((0L, big), (1L, big + 999L), (2L, big + 1000L),
      (3L, -big - 1000L), (4L, -big - 1L), (5L, -big))
      .toDF("event_id", "ts_us")
    val got = RangeJoin.binnedRangeJoin(e, "ts_us", r,
        "start_us", "end_us", binUs = 333L)
      .select($"event_id", $"range_id").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 0L), (1L, 0L), (3L, 1L), (4L, 1L)), s"got $got")
  }

  test("a wide range replicates to every bin it overlaps and only those") {
    val one = Seq((0L, 50L, 450L)).toDF("range_id", "start_us", "end_us")
    val hits = RangeJoin.binnedRangeJoin(events, "ts_us", one,
        "start_us", "end_us", binUs = 100L)
      .select("ts_us").as[Long].collect().toSet
    val expect = Set(50L, 119L, 120L, 129L, 130L, 199L, 200L, 299L, 300L,
      449L, 100L, 400L)
    assert(hits == expect, s"got $hits")
  }
}
