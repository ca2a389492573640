package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.{Retry, Sinks}

class SourcesAndPlansSpec extends SparkSpec {
  import spark.implicits._

  test("cosineNative is bit-identical to the composable fold form") {
    val emb = Tables.embeddings(spark, sf).limit(50)
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val both = a.crossJoin(b).filter($"ia" < $"ib")
      .select(
        Similarity.cosine($"va", $"vb").as("fold"),
        Similarity.cosineNative($"va", $"vb").as("native"))
    assert(both.filter($"fold" =!= $"native").count() == 0)
  }

  test("cosineNative yields null (like the fold form) on ragged arrays") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val row = df.select(
      Similarity.cosine($"a", $"b").as("fold"),
      Similarity.cosineNative($"a", $"b").as("native")).head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("JSON array sink round-trips through the pipeline's reader") {
    val dir = Files.createTempDirectory("sink").toString
    val df = Seq((1L, "story", "alice", 1704153600L, "t1"),
      (2L, "story", "bob", 1704240000L, "t2"))
      .toDF("id", "type", "by", "time", "title")
    val dest = s"$dir/hn_raw_20240102_000000.json"
    Sinks.writeJsonArray(df, dest)
    val txt = Files.readString(java.nio.file.Paths.get(dest)).trim
    assert(txt.startsWith("[") && txt.endsWith("]"))
    val back = graft.pipeline.HnPipeline.readRaw(spark, dest)
    assert(back.count() == 2)
    assert(back.select("by").as[String].collect().toSet == Set("alice", "bob"))
  }

  test("CSV round-trip with explicit schema (no inference for contract tables)") {
    val dir = Files.createTempDirectory("csv").toString
    val src = Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"value")
    src.write.mode("overwrite").option("header", true).csv(dir)
    val back = spark.read
      .schema("event_id LONG, event_type STRING, value DOUBLE")
      .option("header", true).csv(dir)
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("retry: succeeds after transient failures, rethrows after budget") {
    var calls = 0
    val got = Retry.withRetry(retries = 3, backoffMs = 1) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(got == 42 && calls == 3)
    var calls2 = 0
    val ex = intercept[RuntimeException] {
      Retry.withRetry(retries = 2, backoffMs = 1) {
        calls2 += 1; throw new RuntimeException("permanent")
      }
    }
    assert(ex.getMessage == "permanent" && calls2 == 2)
  }
}
