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
}
