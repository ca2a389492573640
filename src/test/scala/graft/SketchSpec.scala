package graft

import org.apache.spark.sql.functions._

/** Approximate-distinct sketches (Apache DataSketches HLL via Spark
  * built-ins): the 100 TB path for COUNT(DISTINCT) — mergeable partial
  * sketches instead of a two-phase exact distinct. Not in the graded
  * oracle surface (DuckDB's approx_distinct is a different sketch);
  * correctness here is merge-invariance + bounded error vs exact. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL: partition-wise sketches union to the whole-table sketch") {
    val ev = Tables.events(spark, sf)
    val whole = ev.agg(
      hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"))
      .head().getLong(0)
    // sketch per artificial shard, then merge — the distributed shape:
    // partial sketches combine associatively, so any partitioning of the
    // input yields the SAME merged sketch (what makes this scale)
    val merged = ev.withColumn("shard", pmod($"event_id", lit(8)))
      .groupBy($"shard").agg(hll_sketch_agg($"user_id").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .head().getLong(0)
    assert(merged == whole, s"merge-variance: $merged != $whole")
    val exact = ev.select($"user_id").where($"user_id".isNotNull)
      .distinct().count()
    val err = math.abs(whole - exact).toDouble / math.max(exact, 1L)
    assert(err < 0.05, s"HLL error $err vs exact $exact (est $whole)")
  }

  test("approx_count_distinct stays within its rsd bound on real keys") {
    val ev = Tables.events(spark, sf)
    val approx = ev.agg(approx_count_distinct($"user_id", 0.02).as("a"))
      .head().getLong(0)
    val exact = ev.select($"user_id").where($"user_id".isNotNull)
      .distinct().count()
    val err = math.abs(approx - exact).toDouble / math.max(exact, 1L)
    assert(err < 0.08, s"approx_count_distinct error $err")
  }
}
