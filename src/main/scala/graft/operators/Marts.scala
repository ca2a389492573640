package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mart-style grouped aggregations — the reference's three daily marts
  * (`/root/reference/sql/mart/02_marts.sql`), generalized.
  *
  * Shape: shared filtered `base` (predicate applied once, as in the
  * reference's CTE) → groupBy(1..2 keys) → count / sum / avg / max with
  * explicit output casts mirroring `::int`, `::bigint`,
  * `::numeric(10,2)` (`02_marts.sql:32-36`).
  *
  * Scale notes: these are hash aggregations with map-side partial
  * aggregation; the only shuffle is on the grouping keys. Cardinality of
  * the output (days, days×domains, days×users) is small relative to the
  * input, so partial aggregation collapses most rows before the
  * exchange — this plan holds at 100 TB as long as the key space stays
  * much smaller than the input (true for daily marts by construction).
  * Sums/averages are computed over `decimal(18,2)` rather than double so
  * results are order-independent (exact, associative) — required both
  * for the DuckDB oracle hash-compare and for run-to-run determinism on
  * a real cluster where partition order is not stable. Final outputs are
  * cast decimal→double: both Spark (`BigDecimal.doubleValue`) and DuckDB
  * produce the correctly-rounded nearest double, so the bits match
  * across engines while readers get a plain double column.
  */
object Marts {

  /** Money-ish double column → exact decimal for associative aggregation. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Average as DOUBLE division of an exact decimal sum by the count.
    * Never round a QUOTIENT to decimal: the quotient can land on an
    * exact decimal half, where Spark (HALF_UP on the exact decimal) and
    * DuckDB (half-even on a double quotient) disagree — hit at
    * sf0.001. Both operands convert to double correctly rounded, and
    * double division is correctly rounded in both engines, so the raw
    * double quotient is bit-identical with NO ambiguous rounding step.
    * (The reference's `::numeric(10,2)` on averages is presentation
    * formatting, not aggregation semantics.) */
  def avgDec2(c: Column): Column =
    sum(dec2(c)).cast("double") / count(lit(1)).cast("double")

  /** G1 — daily_story_metrics analog (`02_marts.sql:11-39`) over `events`:
    * ts ≙ time_utc, event_type ≙ type ('purchase' ≙ 'story'), value ≙ score.
    */
  def dailyMetrics(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "purchase" && col("ts").isNotNull)
      .select(to_date(col("ts")).as("metric_date"), col("value"))
      .groupBy("metric_date")
      .agg(
        count(lit(1)).cast("int").as("events_count"),
        sum(dec2(col("value"))).cast("decimal(18,2)").cast("double").as("total_value"),
        avgDec2(col("value")).as("avg_value"))

  /** Partial daily aggregate carrying combinable state (count + sum),
    * from which avg derives at read time. The incremental-refresh
    * building block: at 100 TB you don't re-aggregate all history per
    * batch (the reference's full refresh, `02_marts.sql:1-5`) — you
    * aggregate the new batch and combine partials per key. */
  def dailyPartial(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "purchase" && col("ts").isNotNull)
      .select(to_date(col("ts")).as("metric_date"), col("value"))
      .groupBy("metric_date")
      .agg(
        count(lit(1)).cast("bigint").as("cnt"),
        sum(dec2(col("value"))).cast("decimal(18,2)").as("sm"))

  /** Combine two partial daily marts (counts and sums add; both are
    * associative, so any combine tree gives the same result). */
  def combinePartials(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("metric_date")
      .agg(sum(col("cnt")).cast("bigint").as("cnt"),
        sum(col("sm")).cast("decimal(18,2)").as("sm"))

  /** Finalize a partial mart into the reference's reader schema. */
  def finalizeDaily(partial: DataFrame): DataFrame =
    partial.select(
      col("metric_date"),
      col("cnt").cast("int").as("events_count"),
      col("sm").cast("double").as("total_value"),
      (col("sm").cast("double") / col("cnt").cast("double")).as("avg_value"))

  /** G2 — top_domains_daily analog (`02_marts.sql:53-90`): 2-key groupBy
    * with a derived bucket column (see Enrich.domainOf for C8/C9). */
  def groupedDaily(base: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    base
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).cast("int").as("events_count"),
        avgDec2(col(valueCol)).as("avg_value"))
}
