package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact grouped order statistics WITHOUT a sort — distributed radix
  * selection. Extension operator (SURVEY §7.1): the scale path for
  * q26's exact percentiles.
  *
  * Spark's exact `percentile` buffers every value of a group in one
  * aggregation buffer (OOM at group sizes that matter), and the
  * classic alternative — global sort + row_number — pays a full
  * shuffle AND serializes each group's sort. Selection doesn't need
  * either: the r-th smallest of n BIGINT values can be found by
  * repeatedly counting values into `fanout` equal-width sub-intervals
  * and descending into the one that spans rank r (radix / bisection
  * selection). Every pass is a partial-aggregated COUNT — map-side
  * combined, shuffle sized by (distinct live intervals × fanout),
  * never by rows (a group's quantiles share one interval until their
  * descents diverge, and shared intervals are counted ONCE) — and
  * the interval width shrinks ×fanout per pass, so the
  * pass count is ⌈log_fanout(range)⌉ (≤ 4 passes for the full 64-bit
  * range at the default fanout 65536; a ×100-fixed-point metric
  * range converges in 2–3). No SortExec appears anywhere in any
  * pass's plan.
  *
  * 100-TB economics: pass 1 scans the table once (the unavoidable
  * cost); every later pass filters to the surviving intervals —
  * pushed-down BETWEEN predicates that parquet row-group min/max
  * stats skip on — so the narrow passes read a vanishing fraction of
  * the data. A planted mega-duplicate (90% of rows one value) does
  * not degrade anything: counting is skew-blind, and the interval
  * collapses to width 1 the moment the duplicate dominates it.
  * Contrast q26 (`percentile`): same answers, but its per-group
  * buffer is group-sized — THIS is the form that survives a 100×
  * group.
  *
  * Driver state is one (interval, rank) pair per (group, quantile) —
  * the HeavyHitters decide-and-fetch bound: groups are an
  * operator-bounded dimension here (like centroids); for unbounded
  * group counts compose per-group selection differently (q26) or
  * raise fanout and accept the wider count frame.
  *
  * Rank definition (pinned, cross-engine unambiguous): the result for
  * quantile num/den over n values is the r-th smallest with
  * r = (n−1)·num ÷ den + 1 (integer division) — the lower /
  * type-1 discrete order statistic, reproducible in ANSI SQL as a
  * ROW_NUMBER filter with the same integer arithmetic (no libm, no
  * interpolation — the q64 portability discipline).
  */
object Quantiles {

  /** One requested order statistic: φ = num/den (0 ≤ num ≤ den). */
  final case class Quantile(name: String, num: Long, den: Long) {
    require(den > 0 && num >= 0 && num <= den,
      s"quantile $name = $num/$den must lie in [0, 1]")
  }

  /** Exact per-group values of each requested quantile over a BIGINT
    * value column. Output: one row per group — (grp, <q.name>...),
    * group values NULL-filtered on the value side (n counts non-null
    * rows only, matching the SQL twin). Groups with no non-null rows
    * are absent, as in any GROUP BY. */
  def radixQuantiles(df: DataFrame, grp: Column, value: Column,
                     quantiles: Seq[Quantile],
                     fanout: Int = 65536): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    require(fanout >= 2, "fanout must be at least 2")
    val spark = df.sparkSession
    val keyed = df.select(grp.cast("string").as("g"),
        value.cast("long").as("x"))
      .filter(col("g").isNotNull && col("x").isNotNull)

    // Pre-pass: per-group n / min / max — one partial-aggregated scan.
    // One driver row per group (bounded-groups contract, see scaladoc).
    val stats = keyed.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("x")).as("lo"),
        max(col("x")).as("hi"))
      .collect()

    // Target state: (group, quantile) → candidate interval [lo, hi]
    // (inclusive, value domain) + rank r within the group's rows
    // falling in that interval. Invariant: the answer is the r-th
    // smallest value among the group's rows with x ∈ [lo, hi].
    final case class Target(g: String, qi: Int, lo: Long, hi: Long, r: Long)
    var active = stats.toSeq.flatMap { row =>
      val (g, n) = (row.getString(0), row.getLong(1))
      val (lo, hi) = (row.getLong(2), row.getLong(3))
      quantiles.zipWithIndex.map { case (q, qi) =>
        // r = (n-1)*num / den + 1, computed in BigInt so a huge n
        // cannot overflow the product before the division
        val r = ((BigInt(n - 1) * q.num) / q.den).toLong + 1
        Target(g, qi, lo, hi, r)
      }
    }
    var done = List.empty[(String, Int, Long)] // (g, qi, answer)
    val widthOf: Target => BigInt = t =>
      (BigInt(t.hi) - BigInt(t.lo) + fanout) / fanout // ceil((hi-lo+1)/fanout)

    while (active.nonEmpty) {
      val (solved, open) = active.partition(t => t.lo == t.hi)
      done = solved.map(t => (t.g, t.qi, t.lo)).toList ::: done
      active = open
      if (active.nonEmpty) {
        // one scan: rows joining ANY active interval, counted into
        // fanout equal-width sub-intervals per DISTINCT (group,
        // interval) — NOT per (group, quantile): in early passes all
        // of a group's quantiles share one interval (pass 1: the
        // whole group range), and counting per quantile would
        // multiply every per-task aggregation buffer and the shuffle
        // by |quantiles| for identical numbers. Targets look their
        // interval's counts up driver-side. The interval frame is
        // tiny (≤ |targets| rows) → broadcast; the count's shuffle
        // is (distinct intervals × fanout)-sized.
        val intervals = active.map(t => (t.g, t.lo, t.hi)).distinct
        val widthOfIv: ((String, Long, Long)) => BigInt = iv =>
          (BigInt(iv._3) - BigInt(iv._2) + fanout) / fanout
        val iv = spark.createDataFrame(
          spark.sparkContext.parallelize(intervals.map(i =>
            Row(i._1, i._2, i._3, widthOfIv(i).toLong)), 1),
          StructType(Seq(StructField("ig", StringType),
            StructField("ilo", LongType),
            StructField("ihi", LongType), StructField("w", LongType))))
        // bucket = (x - ilo) div w: the difference is computed in
        // DECIMAL(38,0) because the full Long domain makes x - ilo
        // overflow BIGINT (ANSI throws) when the interval spans more
        // than 2^63 values, and the quotient via IntegralDivide —
        // NOT `/` + floor: decimal `/` rounds to scale 6 first, which
        // flips bucket ids at boundaries (2047.9999999999998 rounds
        // to 2048.000000 before the floor). IntegralDivide truncates
        // the exact quotient, and x - ilo ≥ 0 makes that a floorDiv.
        val diff = col("x").cast("decimal(38,0)") -
          col("ilo").cast("decimal(38,0)")
        val bucket = org.apache.spark.sql.GraftColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            org.apache.spark.sql.GraftColumnBridge.expression(diff),
            org.apache.spark.sql.GraftColumnBridge.expression(
              col("w").cast("decimal(38,0)"))))
        // literal pre-filter, not just the join condition: the join's
        // range predicates reference the broadcast side, so they can
        // never reach the scan — without this, EVERY pass rescans the
        // full table and the descent costs passes × full-scan. As an
        // OR of literal per-group ranges (|targets| bounded terms)
        // the predicate is pushed into the source, and parquet
        // row-group min/max stats skip everything outside the
        // surviving intervals — passes after the first read a
        // vanishing fraction of the data.
        val livePred = intervals.map(i =>
            col("g") === lit(i._1) &&
              col("x") >= lit(i._2) && col("x") <= lit(i._3))
          .reduce(_ || _)
        val counts = keyed.filter(livePred).join(broadcast(iv),
            col("g") === col("ig") &&
              col("x") >= col("ilo") && col("x") <= col("ihi"))
          .groupBy(col("g"), col("ilo"), col("ihi"),
            bucket.cast("long").as("b"))
          .agg(count(lit(1)).as("c"))
          .collect()
          .groupBy(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .map { case (k, rs) =>
            k -> rs.map(r => r.getLong(3) -> r.getLong(4))
              .sortBy(_._1).toSeq
          }
        active = active.map { t =>
          val buckets = counts((t.g, t.lo, t.hi))
          // descend into the bucket spanning rank r
          var rem = t.r
          val (b, inBucket) = buckets.iterator.map { case (b, c) =>
            val before = rem; rem -= c; (b, c, before)
          }.collectFirst { case (b, c, before) if before <= c =>
            (b, before)
          }.getOrElse(sys.error(
            s"rank ${t.r} exceeds interval row count — impossible " +
              "unless the input changed between passes"))
          // BigInt: b·w can exceed Long.MaxValue even though the
          // resulting bounds (≤ hi) always fit
          val w = widthOf(t)
          val lo2 = (BigInt(t.lo) + w * b).toLong
          val hi2 = (BigInt(lo2) + w - 1).min(BigInt(t.hi)).toLong
          Target(t.g, t.qi, lo2, hi2, inBucket)
        }
      }
    }

    // assemble: one row per group, quantiles as named columns
    val byGroup = done.groupBy(_._1).toSeq.map { case (g, vs) =>
      val m = vs.map(v => v._2 -> v._3).toMap
      Row.fromSeq(g +: quantiles.indices.map(m(_)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(byGroup, 1),
      StructType(StructField("grp", StringType) +:
        quantiles.map(q => StructField(q.name, LongType))))
  }
}
