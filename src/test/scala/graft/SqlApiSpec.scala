package graft

/** The SQL front end reaches the same plans as the DataFrame API: run
  * representative queries both ways and require identical results. */
class SqlApiSpec extends SparkSpec {

  test("spark.sql twins match the DataFrame queries row-for-row") {
    Sql.registerTables(spark, sf)
    val twins = Seq(
      "q15_join_agg_nation" ->
        """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
          |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
          |FROM orders
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin,
      "q19_rollup" ->
        """SELECT COALESCE(event_type, '(all)') AS event_type,
          |       CAST(COUNT(*) AS BIGINT) AS n,
          |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total,
          |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          |FROM events
          |GROUP BY ROLLUP(event_type)""".stripMargin,
      "q7_dup_check" ->
        """SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n
          |FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1""".stripMargin)
    twins.foreach { case (name, sqlText) =>
      val viaSql = spark.sql(sqlText)
      val viaDf = SparkEntry.queries(name)(spark, sf)
      assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty,
        s"$name: SQL and DataFrame results differ")
    }
  }
}
