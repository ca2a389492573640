package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink breadth beyond the contract queries: ORC round-trip,
  * corrupt-record capture on CSV/JSON reads (K5 fail-fast vs quarantine
  * semantics), schema-evolution unions. */
class SourcesExtraSpec extends SparkSpec {
  import spark.implicits._

  test("ORC round-trip preserves rows and types") {
    val dir = Files.createTempDirectory("orc_rt").toString + "/ev"
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"value", $"ts")
    ev.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == ev.schema)
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
  }

  test("corrupt CSV rows are quarantined, not silently dropped or fatal") {
    val dir = Files.createTempDirectory("csv_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"),
      "1,alpha,10.5\n2,beta,not_a_number\n3,gamma,7.25\n")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache() // corrupt-record column requires materialization first
    assert(df.count() == 3)
    val bad = df.filter($"_corrupt_record".isNotNull).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record")
      .contains("not_a_number"))
    val good = df.filter($"_corrupt_record".isNull)
      .select($"id", $"score").as[(Long, Double)].collect().toSet
    assert(good == Set((1L, 10.5), (3L, 7.25)))
    df.unpersist()
  }

  test("schema evolution: unionByName fills missing columns with nulls") {
    val v1 = Seq((1L, "a")).toDF("id", "name")
    val v2 = Seq((2L, "b", 0.5)).toDF("id", "name", "score")
    val all = v1.unionByName(v2, allowMissingColumns = true)
    assert(all.columns.toSeq == Seq("id", "name", "score"))
    val byId = all.collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(byId == Map(1L -> true, 2L -> false))
  }
}
