package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation: two-stage salted aggregation.
  *
  * When one grouping key holds a disproportionate share of the input
  * (hot user, boilerplate domain), a single hash aggregation funnels
  * that key through one reducer. Salting splits each key into
  * `saltBuckets` sub-keys for a partial aggregate, then combines the
  * partials — the hot key's work spreads across `saltBuckets` tasks and
  * the second shuffle carries only `keys × saltBuckets` rows. Works for
  * any algebraic aggregate (sum/count/min/max); AQE's skew handling
  * covers joins, but aggregation skew still needs this pattern.
  */
object Skew {

  /** An aggregate expressed as (partial over input, combine over the
    * partial results) — the decomposition that makes salting legal. */
  final case class AlgebraicAgg(partial: Column, combine: Column => Column)
  object AlgebraicAgg {
    def sumOf(c: Column): AlgebraicAgg = AlgebraicAgg(sum(c), sum)
    def countAll: AlgebraicAgg = AlgebraicAgg(count(lit(1)), sum)
    def minOf(c: Column): AlgebraicAgg = AlgebraicAgg(min(c), min)
    def maxOf(c: Column): AlgebraicAgg = AlgebraicAgg(max(c), max)
  }

  /** groupBy(keys).agg(...) with a salt stage. `aggs` maps output name →
    * algebraic aggregate. */
  def saltedAgg(df: DataFrame, keys: Seq[String],
                aggs: Map[String, AlgebraicAgg],
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partialCols = aggs.map { case (name, a) =>
      a.partial.as(s"__p_$name")
    }.toSeq
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val finalCols = aggs.map { case (name, a) =>
      a.combine(col(s"__p_$name")).as(name)
    }.toSeq
    partial.groupBy(keys.map(col): _*).agg(finalCols.head, finalCols.tail: _*)
  }

  /** Skewed fact-to-dim equi-join with key salting. A plain shuffle
    * join funnels every row of a hot fact key through ONE reducer —
    * the classic 100 TB stall where 999 tasks finish in seconds and
    * one runs for hours. Salting appends a per-row salt to the fact
    * key and REPLICATES each dim row across all `saltBuckets`
    * sub-keys, so the join key becomes (key, salt) and a hot key's
    * rows spread over `saltBuckets` reducers. The result is exactly
    * the plain inner join (every fact row still meets every matching
    * dim row exactly once — its one salt copy).
    *
    * Cost model: dim side inflates ×saltBuckets — use ONLY when the
    * dim is small-ish yet above the broadcast threshold, or when AQE
    * skew splitting is unavailable (e.g. the skewed side is already
    * co-partitioned from a previous stage, which AQE won't re-split).
    * For broadcast-able dims, `broadcast()` beats salting outright —
    * this operator exists for the gap between the two. The join is
    * hinted shuffle-merge so the salted shape is what actually
    * executes (a silent broadcast would make the salt dead weight).
    *
    * The salt is derived from physical row position, not data — no
    * key statistics needed, uniform by construction. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets.toLong)))
    val repDim = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    saltedFact.join(repDim.hint("shuffle_merge"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
