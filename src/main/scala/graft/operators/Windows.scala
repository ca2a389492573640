package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / time-bucket analytics — extensions beyond the reference
  * (SURVEY §2.I: the reference has no OVER clauses; these generalize its
  * daily marts to running and bucketed forms).
  */
object Windows {

  /** Running (cumulative) sum of `valueCol` per `partKeys`, ordered by
    * `orderCol`. Decimal input keeps the fold exact and deterministic.
    * One shuffle on the partition keys; within-partition sort only. */
  def runningSum(df: DataFrame, partKeys: Seq[String], orderCol: Column,
                 valueCol: Column, as: String): DataFrame = {
    val w = Window.partitionBy(partKeys.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(valueCol).over(w))
  }

  /** As-of join by composition (preference order (a) from the build
    * brief: compose built-ins before custom plans): for each row, carry
    * forward the most recent value of `marked` (null where not
    * applicable) at-or-before it within the partition. One shuffle on
    * the partition keys + in-partition sort — the scalable formulation
    * of "join each event to the latest prior X", with no range
    * cross-join. `order` must be a TOTAL order for determinism. */
  def asOfCarry(df: DataFrame, partKeys: Seq[String], order: Seq[Column],
                marked: Column, as: String): DataFrame = {
    val w = Window.partitionBy(partKeys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(marked, ignoreNulls = true).over(w))
  }

  /** Two-pass bucketed as-of carry — the mega-key mitigation for
    * [[asOfCarry]], same playbook as [[bucketedSessionSummaries]]: a
    * hot key funnels its entire history into ONE task's window sort
    * under the single-window form; bucketing by (keys, time-bucket)
    * restores parallelism.
    *
    * Pass 1 carries within each (key, bucket) — the hot key's rows
    * spread across its time buckets. Pass 2 computes each bucket's
    * FINAL marker value (a partial-aggregable max over a conditional
    * struct — no window over the events) and carries it across the
    * per-key bucket summary (rows per key = buckets spanned,
    * thousands of times fewer than events). Each event resolves to
    * its within-bucket carry, falling back to the latest prior
    * bucket's final value. Bit-identical to [[asOfCarry]] with order
    * (tsUs, tieBreak) — q89 gates that equality against the q20
    * oracle, and AsofSoak holds it at 20 M rows with a planted 10%
    * hot key. */
  def asOfCarryBucketed(df: DataFrame, partKeys: Seq[String], tsUs: Column,
                        tieBreak: Column, marked: Column, as: String,
                        bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val keyCols = partKeys.map(col)
    val withBucket = df
      .withColumn("__b", graft.functions.ColUtil.floorDiv(tsUs, bucketUs))
      .withColumn("__m", marked)
    val wIn = Window.partitionBy(keyCols :+ col("__b"): _*)
      .orderBy(tsUs.asc, tieBreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = withBucket
      .withColumn("__in", last(col("__m"), ignoreNulls = true).over(wIn))
    // bucket-final marker: max over (ts, tie, value) structs of MARKED
    // rows only (max skips the null struct of unmarked rows) — plain
    // partial-aggregable agg, never a window over the events
    val bucketLast = withBucket
      .groupBy(keyCols :+ col("__b"): _*)
      .agg(max(when(col("__m").isNotNull,
        struct(tsUs.as("t"), tieBreak.as("i"), col("__m").as("v"))))
        .getField("v").as("__last"))
    val wPrev = Window.partitionBy(keyCols: _*).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevCarry = bucketLast
      .withColumn("__prev", last(col("__last"), ignoreNulls = true).over(wPrev))
      .select(keyCols :+ col("__b") :+ col("__prev"): _*)
    inBucket.join(prevCarry, partKeys :+ "__b")
      .withColumn(as, coalesce(col("__in"), col("__prev")))
      .drop("__b", "__m", "__in", "__prev")
  }

  /** Frequency-routed as-of carry — the [[sessionSummariesHybrid]]
    * dispatch applied to the as-of family, closing the last plain-
    * window scale-killer without a manual operator choice: keys with
    * ≥ `hotThreshold` events route through [[asOfCarryBucketed]]
    * (their single-task window sort is the ceiling the bucketed form
    * exists for), the long tail through plain [[asOfCarry]] (for
    * sparse keys the bucketed form's extra aggregation + join is pure
    * overhead). One partial-aggregated count pass finds the hot set —
    * small by definition, so both routing joins broadcast; a key
    * rides exactly one route, so the union is disjoint and the result
    * is bit-identical to [[asOfCarry]] with order (tsUs, tieBreak)
    * (q94 gates that against the q20 oracle; both routed forms are
    * individually gated — q20 plain, q89 bucketed). */
  def asOfCarryHybrid(df: DataFrame, partKeys: Seq[String], tsUs: Column,
                      tieBreak: Column, marked: Column, as: String,
                      bucketUs: Long,
                      hotThreshold: Long = 100000L): DataFrame = {
    val keyCols = partKeys.map(col)
    val hot = df.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__kn"))
      .filter(col("__kn") >= hotThreshold)
      .select(keyCols: _*)
    val hotCarry = asOfCarryBucketed(
      df.join(broadcast(hot), partKeys, "left_semi"),
      partKeys, tsUs, tieBreak, marked, as, bucketUs)
    val coldCarry = asOfCarry(
      df.join(broadcast(hot), partKeys, "left_anti"),
      partKeys, Seq(tsUs.asc, tieBreak.asc), marked, as)
    hotCarry.unionByName(coldCarry)
  }

  /** Gap-based sessionization: a new session starts after STRICTLY MORE
    * than `gapMicros` of inactivity — the same boundary rule as Spark's
    * native `session_window` (verified on this build: an event at
    * exactly prev+gap merges into the session). Two stacked windows on
    * one partitioning (lag, then running sum of session-start flags) —
    * a single shuffle; the batch twin of Structured Streaming's session
    * windows. Output adds the documented columns `ts_us` (event time in
    * epoch micros) and `session_id`. */
  def sessionize(df: DataFrame, partKeys: Seq[String], tsCol: String,
                 gapMicros: Long, tieBreak: Column): DataFrame = {
    require(!df.columns.contains("ts_us") && !df.columns.contains("session_id"),
      "sessionize adds ts_us/session_id output columns; input already has one")
    val w = Window.partitionBy(partKeys.map(col): _*)
      .orderBy(col(tsCol).asc, tieBreak.asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("ts_us", unix_micros(col(tsCol)))
      .withColumn("__prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("__new_sess",
        when(col("__prev_us").isNull ||
          col("ts_us") - col("__prev_us") > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new_sess")).over(run))
      .drop("__prev_us", "__new_sess")
  }

  /** Scalable session SUMMARIES via two-pass bucketed sessionization —
    * the mitigation for the mega-key ceiling of [[sessionize]] (one key
    * with millions of events lands its whole sort in one task; the
    * 50M-row soak measured this going superlinear).
    *
    * Pass 1 partitions by (keys, time-bucket) — a hot key splits across
    * time buckets, restoring parallelism — and sessionizes within each
    * bucket. Pass 2 re-sessionizes the per-bucket SESSION RECORDS per
    * key (rows per key = sessions, bounded by span/gap, thousands of
    * times fewer than events), merging sessions that continue across a
    * bucket boundary (start − prev_end ≤ gap, the same merge-at-gap
    * rule). Produces exactly the summaries
    * `sessionize(...).groupBy(session)` would — spec-verified — with
    * the heavy pass parallel over buckets.
    *
    * `bucketMicros` must exceed `gapMicros` (a session can then span at
    * most adjacent CHAINS of buckets, which pass 2 stitches). */
  def sessionSummariesBucketed(df: DataFrame, partKeys: Seq[String],
                               tsCol: String, gapMicros: Long,
                               bucketMicros: Long): DataFrame = {
    require(bucketMicros > gapMicros,
      s"bucket width $bucketMicros must exceed the session gap $gapMicros")
    val keyCols = partKeys.map(col)
    val withUs = df.select(keyCols :+ unix_micros(col(tsCol)).as("__us"): _*)
      .withColumn("__bucket",
        graft.functions.ColUtil.floorDiv(col("__us"), bucketMicros))
    val w1 = Window.partitionBy(keyCols :+ col("__bucket"): _*)
      .orderBy(col("__us").asc)
    val run1 = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = withUs
      .withColumn("__prev", lag(col("__us"), 1).over(w1))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__us") - col("__prev") > gapMicros, 1L).otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(run1))
      .groupBy(keyCols :+ col("__bucket") :+ col("__sess"): _*)
      .agg(min(col("__us")).as("__s"), max(col("__us")).as("__e"),
        count(lit(1)).as("__n"))
    val w2 = Window.partitionBy(keyCols: _*).orderBy(col("__s").asc, col("__e").asc)
    val run2 = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("__prevE", lag(col("__e"), 1).over(w2))
      .withColumn("__chain",
        when(col("__prevE").isNull ||
          col("__s") - col("__prevE") > gapMicros, 1L).otherwise(0L))
      .withColumn("__cid", sum(col("__chain")).over(run2))
      .groupBy(keyCols :+ col("__cid"): _*)
      .agg(min(col("__s")).as("start_us"), max(col("__e")).as("end_us"),
        sum(col("__n")).cast("bigint").as("n_events"))
      .drop("__cid")
  }

  /** Plain single-window session summaries (events-per-key lands in one
    * task — fine for the long tail, the ceiling for hot keys). */
  def sessionSummaries(df: DataFrame, partKeys: Seq[String], tsCol: String,
                       gapMicros: Long): DataFrame = {
    val keyCols = partKeys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__us").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(keyCols :+ unix_micros(col(tsCol)).as("__us"): _*)
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__us") - col("__prev") > gapMicros, 1L).otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(run))
      .groupBy(keyCols :+ col("__sess"): _*)
      .agg(min(col("__us")).as("start_us"), max(col("__us")).as("end_us"),
        count(lit(1)).cast("bigint").as("n_events"))
      .drop("__sess")
  }

  /** Frequency-routed session summaries: keys with ≥ `hotThreshold`
    * events go through the bucketed two-pass form (their single-task
    * sort is the scaling ceiling), the long tail through the plain
    * single-window form (for sparse keys the bucketed form degenerates
    * to session-records ≈ events and its extra pass is pure overhead —
    * measured at 50M rows). One cheap partial-aggregated count pass
    * finds the hot set; it is small by definition, so both routing
    * joins broadcast. The same routing logic Skew.saltedAgg applies to
    * aggregation, applied to windows. */
  def sessionSummariesHybrid(df: DataFrame, partKeys: Seq[String],
                             tsCol: String, gapMicros: Long,
                             bucketMicros: Long,
                             hotThreshold: Long = 100000L): DataFrame = {
    val keyCols = partKeys.map(col)
    val hot = df.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__kn"))
      .filter(col("__kn") >= hotThreshold)
      .select(keyCols: _*)
    val hotSessions = sessionSummariesBucketed(
      df.join(broadcast(hot), partKeys, "left_semi"),
      partKeys, tsCol, gapMicros, bucketMicros)
    val coldSessions = sessionSummaries(
      df.join(broadcast(hot), partKeys, "left_anti"),
      partKeys, tsCol, gapMicros)
    hotSessions.unionByName(coldSessions)
  }

  /** Tumbling event-time bucket aggregation — the batch twin of the
    * Structured Streaming windowed aggregation in
    * [[graft.streaming.StreamingJobs]]. `window()` is a plain projection
    * (bucket start = floor(ts)), so this is an ordinary hash aggregate:
    * partial-agg before one shuffle on (bucket, keys). */
  def tumbling(df: DataFrame, tsCol: String, width: String,
               keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), width) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("win_start_us", unix_micros(col("window.start")))
      .drop("window")
}
