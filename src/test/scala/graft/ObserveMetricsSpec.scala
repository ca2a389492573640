package graft

import org.apache.spark.sql.functions._

/** In-flight metrics via Dataset.observe: quality counters (row count,
  * null count, sum) computed DURING the main job — at 100 TB a
  * separate validation scan doubles the read bill; observe() rides the
  * existing pass and surfaces through QueryExecution.observedMetrics. */
class ObserveMetricsSpec extends SparkSpec {

  test("observed metrics ride the main action without a second scan") {
    val ev = Tables.events(spark, sf)
    val observed = ev.observe("quality",
      count(lit(1)).as("n_rows"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_values"),
      count(col("ts")).as("ts_nonnull"))
    val df = observed.filter(col("event_type") === "purchase")
    // collect() drives df's OWN QueryExecution - count() would build a
    // separate one and the metrics would never materialize on df
    val purchases = df.collect().length.toLong
    val metrics = df.queryExecution.observedMetrics("quality")
    val nRows = metrics.getAs[Long]("n_rows")
    assert(nRows == ev.count(), "observe saw a different row count than the scan")
    assert(purchases < nRows)
    assert(metrics.getAs[Long]("ts_nonnull") <= nRows)
    assert(metrics.getAs[Long]("null_values") >= 0L)
  }
}
