package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Scale soak for the binned pure range join (q88, dev tool): 20 M
  * events × 100 k overlapping ranges — a workload whose naive
  * inequality join is 2×10^12 comparisons (hours of nested loop) and
  * whose binned form is one bucket equi-join over a 300 k-row
  * replicated range table. The fixture is a uniform grid, so the
  * exact pair count has a closed form and the equality gate needs no
  * second join:
  *
  *   ranges i ∈ [0, R): [i·W, i·W + 3W)  — every point from 2W on is
  *   covered by exactly 3 ranges; events sit at t = j·W/P (P per
  *   bin), so total pairs = 3·n − 3·P (the first bin's events see 1
  *   range, the second bin's 2).
  *
  * `sbt "runMain graft.RangeJoinSoak [nRanges] [perBin]"`.
  */
object RangeJoinSoak {
  def main(args: Array[String]): Unit = {
    val nRanges = args.headOption.map(_.toLong).getOrElse(100000L)
    val perBin = args.drop(1).headOption.map(_.toLong).getOrElse(200L)
    val spark = Sessions.local(32)
    val w = 1000000L // 1s bins in us
    val n = nRanges * perBin
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val base = "target/soak/rangejoin"
    val evPath = s"$base/events.parquet"
    spark.range(n).select(col("id").as("event_id"),
        (col("id") * (w / perBin)).as("ts_us"))
      .repartition(32).write.mode("overwrite").parquet(evPath)
    val events = spark.read.parquet(evPath)
    val ranges = spark.range(nRanges).select(col("id").as("range_id"),
      (col("id") * w).as("start_us"), (col("id") * w + 3 * w).as("end_us"))

    val joined = RangeJoin.binnedRangeJoin(events, "ts_us", ranges,
      "start_us", "end_us", binUs = w)
    val plan = joined.queryExecution.executedPlan.toString
    require(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"soak: binned join must not nested-loop:\n${plan.take(3000)}")

    val (total, tJoin) = time(joined.count())
    val expected = 3 * n - 3 * perBin
    require(total == expected,
      s"q88 soak: $total pairs, closed form says $expected")

    // per-range uniformity: every interior range holds exactly 3P events
    val offRanges = joined.groupBy("range_id").count()
      .filter(col("range_id") >= 2 && col("range_id") < nRanges - 3)
      .filter(col("count") =!= 3 * perBin).count()
    require(offRanges == 0,
      s"q88 soak: $offRanges interior ranges deviate from 3*perBin")

    println(
      s"""{"events":$n,"ranges":$nRanges,"pairs":$total,
         |"naive_comparisons":${n * nRanges},"sec":{"binned_join":$tJoin}}"""
        .stripMargin.replace("\n", ""))
    spark.stop()
  }
}
