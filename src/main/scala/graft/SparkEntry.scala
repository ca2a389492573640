package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is one operator from SURVEY.md §2 (or a
  * scale-extension operator); `oracleSql` holds the DuckDB-runnable ANSI
  * twin where the semantics are SQL-expressible. Column names and final
  * types are cast explicitly on BOTH sides — the driver's compare sorts
  * columns by name and hashes values, so names/types must align exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Marts.dailyMetrics(Tables.events(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_daily_metrics" -> ((s, dir) => Marts.dailyMetrics(Tables.events(s, dir)))
  )

  def oracleSql: Map[String, String] = Map(
    "q1_daily_metrics" ->
      """SELECT CAST(ts AS DATE) AS metric_date,
        |       CAST(COUNT(*) AS INT) AS events_count,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) / COUNT(*) AS DECIMAL(10,2)) AS avg_value
        |FROM events
        |WHERE event_type = 'purchase' AND ts IS NOT NULL
        |GROUP BY 1""".stripMargin
  )
}
