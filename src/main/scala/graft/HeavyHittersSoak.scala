package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** Misra–Gries heavy hitters (q76) at volume: 50 M rows where 5 hot
  * keys hold ~35% of the stream and ~10 M distinct cold keys churn
  * the 64-counter buffers continuously — the adversarial shape for
  * the sketch (every cold arrival pressures an eviction).
  *
  * Invariants: (1) the two-pass result equals the naive full
  * GROUP BY + HAVING set exactly — including counts; (2) the result
  * is bit-identical across two runs; (3) the hot keys are all
  * present. Timing of both plans is printed for the record. Measured
  * honestly: on local[32] at 50 M×10 M keys the naive plan TIES OR
  * WINS (~3.1 s vs ~3.6 s) — a single-box shuffle of 10 M short keys
  * is cheap, and the typed sketch pass pays encoder costs per row.
  * The sketch's margin is STATE, not local wall-clock: its reduce
  * state is 2k counters per task regardless of key cardinality,
  * where the naive plan's reduce side must materialize/spill the
  * full key space — the same bounded-vs-unbounded argument that
  * bounded q67's exact percentile. At 10⁹+ keys (web-scale token or
  * URL streams) the naive exchange is the bottleneck; MG's is
  * constant.
  *
  * Deterministic: keys derive from xxhash64 of the row id — no RNG.
  */
object HeavyHittersSoak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val k = 64
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ~35% of rows land on 5 hot keys (u % 20 < 7), the rest spread
    // over ~n/5 distinct cold keys.
    val u = pmod(xxhash64(col("id")), lit(1000000007L))
    val key = when(u % 20L < 7L, concat(lit("hot_"), (u % 5L).cast("string")))
      .otherwise(concat(lit("cold_"), (u % (n / 5L)).cast("string")))
    val rows = spark.range(n).select(key.as("k"))

    rows.count() // warm the range+hash codegen so timings compare plans
    val (got1, tSketch) = time {
      HeavyHitters.frequentItems(rows, col("k"), k, "k")
        .as[(String, Long)].collect().toSet
    }
    val (naive, tNaive) = time {
      val total = rows.count()
      rows.groupBy("k").agg(count(lit(1)).cast("bigint").as("cnt"))
        .filter(col("cnt") * k > total)
        .as[(String, Long)].collect().toSet
    }
    println(f"[sketch] $tSketch%.1f s  [naive] $tNaive%.1f s")
    val tBoth = tSketch + tNaive
    require(got1 == naive,
      s"sketch+recheck != naive: missing=${(naive -- got1).take(3)} " +
        s"extra=${(got1 -- naive).take(3)}")
    require(got1.map(_._1) == (0 until 5).map(i => s"hot_$i").toSet,
      s"hot-key set wrong: ${got1.map(_._1)}")

    val (got2, t2) = time {
      HeavyHitters.frequentItems(rows, col("k"), k, "k")
        .as[(String, Long)].collect().toSet
    }
    require(got1 == got2, "heavy hitters not deterministic across runs")

    println(s"""{"rows":$n,"k":$k,"hot_keys":${got1.size},""" +
      s""""counts":${got1.toSeq.sorted.map(_._2).mkString("[", ",", "]")},""" +
      s""""sec":{"both":$tBoth,"run2":$t2}}""")
    spark.stop()
  }
}
