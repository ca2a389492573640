package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions builder constructs the expression (arity-checked)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext) // must register cleanly
    val expr = graft.plans.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.default(
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.default(
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(expr.checkInputDataTypes() ==
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess)
  }

  test("graft_cosine resolves in SQL after extension-style registration") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => graft.plans.CosineSimilarity(exprs.head, exprs(1)), "built-in")
    Tables.embeddings(spark, sf).limit(10).createOrReplaceTempView("emb_v")
    val rows = spark.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, b.embedding) AS sim
        |FROM emb_v a JOIN emb_v b ON a.vec_id = b.vec_id""".stripMargin)
      .collect()
    assert(rows.length == 10)
    // self-similarity is exactly 1.0
    assert(rows.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-12))
  }

  test("partition pruning: date-partitioned write scans only matching partitions") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)
    val firstDate = spark.read.parquet(dir)
      .agg(min(col("event_date"))).head().getDate(0)
    val q = spark.read.parquet(dir).filter(col("event_date") === lit(firstDate))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("isnotnull(event_date"),
      s"expected partition filters in:\n$scan")
    val partsRead = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(q.count() > 0)
  }
}
