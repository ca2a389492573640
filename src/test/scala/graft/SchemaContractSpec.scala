package graft

import org.apache.spark.sql.types._
import graft.operators.Checks

class SchemaContractSpec extends SparkSpec {
  import spark.implicits._

  private val expected = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("conforming frame yields zero violations") {
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "score")
    assert(Checks.schemaContract(df, expected, notNull = Seq("id", "name")).isEmpty)
  }

  test("missing, unexpected, mistyped columns and null constraints are reported") {
    val df = Seq((1L, Some(0.5), "x"), (2L, None, "y"))
      .toDF("id", "score", "extra")
      .selectExpr("id", "CAST(score AS FLOAT) AS score", "extra",
        "CASE WHEN id = 2 THEN NULL ELSE 'n' END AS name")
    val v = Checks.schemaContract(df, expected, notNull = Seq("name", "score"))
      .as[(String, String, Long)].collect().toSet
    assert(v.contains(("unexpected_column", "extra", 1L)))
    assert(v.exists(x => x._1 == "type_mismatch" && x._2.startsWith("score:")))
    assert(v.contains(("null_constraint", "name", 1L)))
    assert(v.contains(("null_constraint", "score", 1L)))
  }

  test("normalizeNanos dispatches on the actual ts dtype") {
    // The fixture generator has shipped ts as long nanos AND as
    // timestamp micros across rounds; both must normalize to the same
    // UTC microsecond timestamp, and anything else must fail loudly.
    import org.apache.spark.sql.functions._
    val us = 1704067200123456L // 2024-01-01T00:00:00.123456Z
    val fromLong = Tables.normalizeNanos(
      Seq(us * 1000 + 789).toDF("ts")) // extra ns truncate, never round
    val fromNtz = Tables.normalizeNanos(
      Seq(us).toDF("us").select(timestamp_micros($"us").cast("timestamp_ntz").as("ts")))
    val fromTs = Tables.normalizeNanos(
      Seq(us).toDF("us").select(timestamp_micros($"us").as("ts")))
    for (df <- Seq(fromLong, fromNtz, fromTs)) {
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.select(unix_micros($"ts")).as[Long].head() == us)
    }
    val e = intercept[IllegalStateException] {
      Tables.normalizeNanos(Seq("2024").toDF("ts"))
    }
    assert(e.getMessage.contains("events.ts"))
  }

  test("fixture contract guard: real tables pass; a drifted dtype names the column") {
    Tables.assertContract(spark, sf) // the real fixtures must conform
    // A drifted copy must produce ONE readable failure naming the
    // column (the round-8 failure mode was 63 opaque per-query errors).
    // An ADDITIVE column must NOT fail — additive append is the benign
    // evolution shape q84 exists for; region carries one here to prove
    // the guard warns instead of killing the run.
    val tmp = java.nio.file.Files.createTempDirectory("contract_drift")
    try {
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")) {
        val df = spark.read.parquet(s"$sf/$t.parquet")
        val out =
          if (t == "region") df.withColumn("added_later", $"r_regionkey" * 2)
          else df
        out.coalesce(1).write.parquet(s"$tmp/$t.parquet")
      }
      Tables.assertContract(spark, tmp.toString) // additive-only: no throw
      // now drift a contract column's dtype in the same dir
      val evDrift = spark.read.parquet(s"$sf/events.parquet")
        .withColumn("value", $"value".cast("string"))
      val walk0 = java.nio.file.Files.walk(tmp.resolve("events.parquet"))
      try walk0.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk0.close()
      evDrift.coalesce(1).write.parquet(s"$tmp/events.parquet")
      val e = intercept[IllegalStateException] {
        Tables.assertContract(spark, tmp.toString)
      }
      assert(e.getMessage.contains("events.value"))
      assert(e.getMessage.contains("STRING"))
      // the additive column must not appear in the FAILURE message
      assert(!e.getMessage.contains("added_later"))
    } finally {
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("contract holds for the real contract tables") {
    val ev = Tables.events(spark, sf)
    val exp = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val v = Checks.schemaContract(ev, exp, notNull = Seq("event_id", "event_type"))
    assert(v.isEmpty, v.collect().mkString(", "))
  }
}
