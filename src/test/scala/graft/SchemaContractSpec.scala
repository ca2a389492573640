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
