package graft


import org.apache.spark.sql.functions._
import graft.functions.Enrich

class EnrichSpec extends SparkSpec {
  import spark.implicits._

  test("domainOf: scheme strip, host extraction, lowercase, null/empty bucket") {
    val in = Seq(
      ("https://Example.COM/path/x", "example.com"),
      ("http://news.ycombinator.com", "news.ycombinator.com"),
      ("example.org/no-scheme", "example.org"),
      ("", "(no_domain)"),
      (null.asInstanceOf[String], "(no_domain)")
    ).toDF("url", "expected")
    val bad = in.filter(Enrich.domainOf($"url") =!= $"expected").count()
    assert(bad == 0)
  }

  test("arrayLen: null array -> 0, not -1") {
    val df = Seq(Tuple1(Seq(1L, 2L)), Tuple1(null.asInstanceOf[Seq[Long]]))
      .toDF("kids")
    val got = df.select(Enrich.arrayLen($"kids")).as[Int].collect().sorted
    assert(got.toSeq == Seq(0, 2))
  }

  test("strictLong raises on malformed input, lenientLong defaults") {
    val df = Seq("12", "oops").toDF("v")
    assert(df.select(Enrich.lenientLong($"v")).as[Long].collect().sorted.toSeq
      == Seq(0L, 12L))
    // run the EXPECTED failure in a scratch session: the suites share
    // one SparkSession, and a QueryExecutionListener registered by
    // any other suite (Observation.on) would see this failure and
    // dump an alarming-but-harmless ERROR stack into every green test
    // log. newSession() has its own ExecutionListenerManager.
    val scratch = spark.newSession()
    import scratch.implicits._
    val df2 = Seq("12", "oops").toDF("v")
    val ex = intercept[Throwable] {
      df2.select(Enrich.strictLong(col("v"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("cast"))
  }

  test("epochToTs + filenameTs parse UTC") {
    val df = Seq(("hn_raw_20240102_030405.json", 1704164645L)).toDF("f", "t")
    val row = df.select(
      Enrich.filenameTs($"f").cast("long").as("a"),
      Enrich.epochToTs($"t").cast("long").as("b")).head()
    assert(row.getLong(0) == 1704164645L && row.getLong(1) == 1704164645L)
  }
}
