package graft

import org.apache.spark.sql.functions._
import graft.operators.Marts

class MartsSpec extends SparkSpec {
  test("q1 daily metrics: schema, filter, and exact decimal aggregation") {
    val out = SparkEntry.queries("q1_daily_metrics")(spark, sf)
    assert(out.columns.toSeq ==
      Seq("metric_date", "events_count", "total_value", "avg_value"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // cross-check one group against a direct computation
    val ev = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .withColumn("d", to_date(col("ts")))
    val firstDate = rows.map(_.getDate(0)).min
    val expected = ev.filter(col("d") === lit(firstDate)).count()
    val got = rows.find(_.getDate(0) == firstDate).get.getInt(1)
    assert(got == expected)
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
