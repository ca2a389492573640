package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions cosineBuilder builds a working expression and checks arity") {
    // registration path stores this exact builder
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    // builder output evaluates correctly on literal arrays
    val arr = Literal.create(ArrayData.toArrayData(Array(1.0f, 0.0f)),
      ArrayType(FloatType))
    val expr = graft.plans.GraftExtensions.cosineBuilder(Seq(arr, arr))
    assert(math.abs(expr.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
    // wrong arity is rejected
    val ex = intercept[IllegalArgumentException] {
      graft.plans.GraftExtensions.cosineBuilder(Seq(arr))
    }
    assert(ex.getMessage.contains("2 arguments"))
  }

  test("graft_cosine resolves in SQL after extension-style registration") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", graft.plans.GraftExtensions.cosineBuilder, "built-in")
    Tables.embeddings(spark, sf).filter(col("vec_id") < 10)
      .createOrReplaceTempView("emb_v")
    val rows = spark.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, b.embedding) AS sim
        |FROM emb_v a JOIN emb_v b ON a.vec_id = b.vec_id""".stripMargin)
      .collect()
    assert(rows.length == 10)
    // self-similarity is exactly 1.0
    assert(rows.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-12))
  }

  test("partition pruning: date-partitioned scan reads strictly fewer files") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)
    val firstDate = spark.read.parquet(dir)
      .agg(min(col("event_date"))).head().getDate(0)

    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numFiles").map(_.value)).sum
    }
    val all = filesRead(spark.read.parquet(dir))
    val pruned = filesRead(
      spark.read.parquet(dir).filter(col("event_date") === lit(firstDate)))
    assert(pruned >= 1 && pruned < all,
      s"expected pruned scan ($pruned files) to read fewer than full scan ($all files)")
  }
}
