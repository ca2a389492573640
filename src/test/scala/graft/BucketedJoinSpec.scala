package graft

import org.apache.spark.sql.functions._

/** Scale-path evidence: bucketed tables co-locate their join keys, so
  * the key join plans with NO shuffle exchange on either side — the
  * cluster-scale strategy the engine's design notes rely on for the
  * staging merge and big fact joins. */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf)
        .write.format("parquet")
        .option("path", s"$wh/orders_b")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.customer(spark, sf)
        .write.format("parquet")
        .option("path", s"$wh/customer_b")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle, got:\n$plan")
      // and it still computes the right thing
      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
