package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Enrich
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is one operator row from SURVEY.md §2 (or a
  * scale extension); `oracleSql` holds the DuckDB-runnable ANSI twin.
  * Conventions keeping the exact-hash compare stable:
  *   - column names and final types cast explicitly on BOTH sides;
  *   - doubles aggregated as DECIMAL(18,2) (order-independent);
  *   - timestamps output as epoch micros BIGINT (`unix_micros` /
  *     `epoch_us`) — raw timestamp columns differ in UTC adjustment
  *     between Spark parquet and DuckDB;
  *   - ranking windows use row_number over a total order.
  */
object SparkEntry {

  import Marts.{avgDec2, dec2}

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Marts.dailyMetrics(Tables.events(spark, "/root/testdata/sf0.001"))

  /** Merge fixture: two overlapping keyed batches derived from `events`
    * (target = even ids at ts, batch = ids divisible by 3 at ts+1h) —
    * reproduces the reference's staging-vs-new-batch shape
    * (`/root/reference/sql/load/03_merge.sql`). */
  private def mergeFixture(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), dec2(col("value")).as("val"),
        col("ts"))
    val target = ev.filter(col("event_id") % 2 === 0)
      .withColumn("extracted_at", col("ts")).drop("ts")
    val batch = ev.filter(col("event_id") % 3 === 0)
      .withColumn("extracted_at", col("ts") + expr("interval 1 hour")).drop("ts")
    (target, batch)
  }

  private val mergeFixtureSql =
    """target AS (
      |  SELECT event_id, event_type, CAST(value AS DECIMAL(18,2)) AS val,
      |         CAST(ts AS TIMESTAMP) AS extracted_at
      |  FROM events WHERE event_id % 2 = 0),
      |batch AS (
      |  SELECT event_id, event_type, CAST(value AS DECIMAL(18,2)) AS val,
      |         CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS extracted_at
      |  FROM events WHERE event_id % 3 = 0)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- marts (G1-G3, B3, C6-C11) ----
    "q1_daily_metrics" -> ((s, dir) => Marts.dailyMetrics(Tables.events(s, dir))),

    "q2_domain_daily" -> ((s, dir) =>
      Marts.groupedDaily(
        Tables.documents(s, dir)
          .select(col("lang"), Enrich.domainOf(col("source")).as("domain"),
            col("n_chars")),
        Seq("lang", "domain"), "n_chars")),

    "q3_user_activity" -> ((s, dir) =>
      Marts.groupedDaily(
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase" && col("ts").isNotNull)
          .select(to_date(col("ts")).as("metric_date"),
            coalesce(col("user_id").cast("string"), lit("(unknown)")).as("author"),
            col("value")),
        Seq("metric_date", "author"), "value")),

    // ---- merge / dedup (D1, D2, J1, J2) ----
    "q4_merge_upsert" -> ((s, dir) => {
      val (target, batch) = mergeFixture(s, dir)
      Merge.merged(target, batch, Seq("event_id"), "extracted_at")
        .select(col("event_id"), col("event_type"), col("val"),
          unix_micros(col("extracted_at")).as("extracted_at_us"))
    }),

    "q5_merge_counts" -> ((s, dir) => {
      val (target, batch) = mergeFixture(s, dir)
      Merge.countsPlan(target, batch, Seq("event_id"), "extracted_at")
    }),

    "q6_dedup_keep_last" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val b = ev.filter(col("event_id") % 5 === 0)
        .select(col("event_id"), dec2(col("value")).as("val"), lit(1).as("ord"))
        .unionByName(ev.filter(col("event_id") % 10 === 0)
          .select(col("event_id"), (dec2(col("value")) + 1).cast("decimal(18,2)").as("val"),
            lit(2).as("ord")))
      Dedup.keepLast(b, Seq("event_id"), col("ord")).drop("ord")
    }),

    "q12_anti_join_new" -> ((s, dir) => {
      val (target, batch) = mergeFixture(s, dir)
      batch.join(target, Seq("event_id"), "left_anti")
        .select(col("event_id"), col("event_type"))
    }),

    // ---- checks (B5, G4-G7, S1, J3) ----
    "q7_dup_check" -> ((s, dir) =>
      Checks.duplicateKeys(Tables.lineitem(s, dir), Seq("l_orderkey"))),

    "q8_summary_union" -> ((s, dir) =>
      Checks.summaryUnion(Seq(
        ("orders", Tables.orders(s, dir), "o_orderdate"),
        ("lineitem", Tables.lineitem(s, dir), "l_shipdate"),
        ("events", Tables.events(s, dir), "ts")))),

    "q9_last_day_count" -> ((s, dir) =>
      Checks.lastDayCount(Tables.events(s, dir), "ts")),

    // ---- ranking (T2, T4) ----
    "q10_topk_per_group" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("metric_date"), col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("n"))
      TopK.perGroup(daily, Seq("metric_date"),
        Seq(col("n").desc, col("event_type").asc), 3)
    }),

    "q11_order_limit" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("metric_date"))
        .agg(sum(dec2(col("value"))).cast("decimal(18,2)").as("total"))
        .orderBy(col("total").desc, col("metric_date").asc)
        .limit(5)),

    // ---- enrichment (C2-C5, C7, C14) ----
    "q13_enrich_contract" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        to_date(col("ts")).as("event_date"),
        coalesce(dec2(col("value")), lit(0).cast("decimal(18,2)")).as("val"),
        Enrich.lenientLong(get_json_object(col("props"), "$.k")).as("prop_k"),
        Enrich.truncate(col("event_type"), 3).as("type3"))),

    "q14_array_len" -> ((s, dir) =>
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        Enrich.arrayLen(col("embedding")).as("dim"),
        col("label"))),

    // ---- joins (J2, J3 shapes at scale) ----
    "q15_join_agg_nation" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).cast("bigint").as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("decimal(18,2)").as("total"))),

    "q16_semi_join" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))),

    // ---- windows (T4 extension, §2.I) ----
    "q17_running_total" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("metric_date"), col("event_type"))
        .agg(sum(dec2(col("value"))).cast("decimal(18,2)").as("daily"))
      Windows.runningSum(daily, Seq("event_type"), col("metric_date"),
        col("daily"), "running")
        .withColumn("running", col("running").cast("decimal(18,2)"))
    }),

    "q18_tumbling_hour" -> ((s, dir) =>
      Windows.tumbling(Tables.events(s, dir), "ts", "1 hour", Seq("event_type"),
        Seq(count(lit(1)).cast("bigint").as("n"),
          sum(dec2(col("value"))).cast("decimal(18,2)").as("total")))
        .select(col("win_start_us"), col("event_type"), col("n"), col("total")))
  )

  def oracleSql: Map[String, String] = Map(
    "q1_daily_metrics" ->
      """SELECT CAST(ts AS DATE) AS metric_date,
        |       CAST(COUNT(*) AS INT) AS events_count,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) / COUNT(*) AS DECIMAL(10,2)) AS avg_value
        |FROM events
        |WHERE event_type = 'purchase' AND ts IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "q2_domain_daily" ->
      """SELECT lang,
        |       CASE WHEN source IS NULL OR source = '' THEN '(no_domain)'
        |            ELSE lower(split_part(replace(replace(source,'https://',''),'http://',''),'/',1))
        |       END AS domain,
        |       CAST(COUNT(*) AS INT) AS events_count,
        |       CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) / COUNT(*) AS DECIMAL(10,2)) AS avg_value
        |FROM documents
        |GROUP BY 1, 2""".stripMargin,

    "q3_user_activity" ->
      """SELECT CAST(ts AS DATE) AS metric_date,
        |       COALESCE(CAST(user_id AS VARCHAR), '(unknown)') AS author,
        |       CAST(COUNT(*) AS INT) AS events_count,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) / COUNT(*) AS DECIMAL(10,2)) AS avg_value
        |FROM events
        |WHERE event_type = 'purchase' AND ts IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    "q4_merge_upsert" ->
      s"""WITH $mergeFixtureSql,
         |u AS (SELECT *, 0 AS src FROM target UNION ALL SELECT *, 1 AS src FROM batch),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
         |                 ORDER BY extracted_at DESC, src ASC) AS rn FROM u)
         |SELECT event_id, event_type, val, epoch_us(extracted_at) AS extracted_at_us
         |FROM r WHERE rn = 1""".stripMargin,

    "q5_merge_counts" ->
      s"""WITH $mergeFixtureSql
         |SELECT CAST(COUNT(CASE WHEN t.event_id IS NULL THEN 1 END) AS BIGINT) AS inserted,
         |       CAST(COUNT(CASE WHEN t.event_id IS NOT NULL
         |                        AND b.extracted_at > t.extracted_at THEN 1 END) AS BIGINT) AS updated
         |FROM batch b LEFT JOIN target t USING (event_id)""".stripMargin,

    "q6_dedup_keep_last" ->
      """WITH b AS (
        |  SELECT event_id, CAST(value AS DECIMAL(18,2)) AS val, 1 AS ord
        |  FROM events WHERE event_id % 5 = 0
        |  UNION ALL
        |  SELECT event_id, CAST(CAST(value AS DECIMAL(18,2)) + 1 AS DECIMAL(18,2)), 2
        |  FROM events WHERE event_id % 10 = 0),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ord DESC) rn FROM b)
        |SELECT event_id, val FROM r WHERE rn = 1""".stripMargin,

    "q7_dup_check" ->
      """SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin,

    "q8_summary_union" ->
      """SELECT 'orders' AS tbl, CAST(MIN(o_orderdate) AS DATE) AS min_date,
        |       CAST(MAX(o_orderdate) AS DATE) AS max_date, CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |UNION ALL
        |SELECT 'lineitem', CAST(MIN(l_shipdate) AS DATE), CAST(MAX(l_shipdate) AS DATE), CAST(COUNT(*) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'events', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE), CAST(COUNT(*) AS BIGINT)
        |FROM events""".stripMargin,

    "q9_last_day_count" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS dd FROM events),
        |last_day AS (SELECT MAX(dd) AS maxd FROM d)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n
        |FROM d JOIN last_day ON d.dd = last_day.maxd""".stripMargin,

    "q10_topk_per_group" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS metric_date, event_type,
        |                  CAST(COUNT(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY metric_date
        |                ORDER BY n DESC, event_type ASC) AS INT) AS rnk FROM c)
        |SELECT metric_date, event_type, n, rnk FROM r WHERE rnk <= 3""".stripMargin,

    "q11_order_limit" ->
      """SELECT metric_date, total FROM (
        |  SELECT CAST(ts AS DATE) AS metric_date,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
        |  FROM events GROUP BY 1)
        |ORDER BY total DESC, metric_date ASC LIMIT 5""".stripMargin,

    "q12_anti_join_new" ->
      """SELECT event_id, event_type FROM events
        |WHERE event_id % 3 = 0 AND event_id % 2 <> 0""".stripMargin,

    "q13_enrich_contract" ->
      """SELECT event_id,
        |       epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |       CAST(ts AS DATE) AS event_date,
        |       COALESCE(CAST(value AS DECIMAL(18,2)), CAST(0 AS DECIMAL(18,2))) AS val,
        |       COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS prop_k,
        |       substr(event_type, 1, 3) AS type3
        |FROM events""".stripMargin,

    "q14_array_len" ->
      """SELECT vec_id, CAST(COALESCE(len(embedding), 0) AS INT) AS dim, label
        |FROM embeddings""".stripMargin,

    "q15_join_agg_nation" ->
      """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,

    "q16_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,

    "q17_running_total" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS metric_date, event_type,
        |                  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS daily
        |           FROM events GROUP BY 1, 2)
        |SELECT metric_date, event_type, daily,
        |       CAST(SUM(daily) OVER (PARTITION BY event_type ORDER BY metric_date
        |            ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,2)) AS running
        |FROM d""".stripMargin,

    "q18_tumbling_hour" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS win_start_us,
        |       event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
        |FROM events
        |GROUP BY 1, 2""".stripMargin
  )
}
