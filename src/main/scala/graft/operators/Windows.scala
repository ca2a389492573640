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
