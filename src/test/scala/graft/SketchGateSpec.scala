package graft

import org.apache.spark.sql.functions._
import graft.operators.Checks

class SketchGateSpec extends SparkSpec {

  test("gated passes rows through unchanged when the condition holds") {
    val ev = Tables.events(spark, sf).limit(100)
    val out = Checks.gated(ev, "ok", col("event_id").isNotNull, col("event_id"))
    assert(out.count() == 100)
    assert(out.columns.toSeq == ev.columns.toSeq, "gate column is dropped")
  }

  test("gated fails the JOB when any row violates the condition") {
    val ev = Tables.events(spark, sf).limit(100)
    val boom = Checks.gated(ev, "impossible",
      col("event_id") < 0, col("event_id"))
    val e = intercept[Exception](boom.count())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("gate 'impossible' failed")))
  }

  test("q67: sketches agree with exact twins on the fixture data") {
    // runs the full gated plan — an out-of-tolerance HLL++ or quantile
    // sketch would throw, so a green count IS the accuracy assertion
    val out = SparkEntry.queries("q67_sketch_gate")(spark, sf)
    val perType = out.collect().map(r =>
      r.getAs[String]("event_type") -> r.getAs[Long]("n_users")).toMap
    val direct = Tables.events(spark, sf).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    assert(perType == direct)
  }

  test("q67's gate construction trips on a PLANTED sketch error") {
    // the same gate chain q67 builds, fed a deliberately drifted
    // sketch value — proves the bounded (hash-sampled) form still
    // FAILS when a sketch is wrong, i.e. the r6 rework didn't gate
    // the assertion out of existence
    val agg = Tables.events(spark, sf).groupBy(col("event_type")).agg(
      percentile(col("value"), lit(0.5)).as("p50x"))
      .withColumn("p50s", col("p50x") * 1.5) // planted: 50% off
    val boom = Checks.gated(agg, "p50_abs_err",
      abs(col("p50s") - col("p50x")) <= abs(col("p50x")) * 0.05 + 0.01,
      concat(lit("sketch="), col("p50s"), lit(" exact="), col("p50x")))
    val e = intercept[Exception](boom.count())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("gate 'p50_abs_err' failed")))
  }
}
