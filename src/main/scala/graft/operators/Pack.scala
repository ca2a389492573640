package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash32

/** Token-budget sequence packing (training-example prep): stream
  * documents in id order into `binTokens`-token bins, shard-parallel.
  *
  * The cumulative-sum window that assigns bins is inherently a sort, so
  * the scale lever is the SHARD: docs are hash-sharded and each shard
  * packs independently. The shard count is DERIVED from the input size
  * — `ceil(n_docs / targetDocsPerShard)`, floor 1 — rather than a
  * constant: with a fixed shard count each shard's window is a
  * single-task sort over corpus/k rows and grows without bound (at
  * 100 TB a constant 8 means eight 12.5 TB sorts); with a derived
  * count each shard stays a bounded `targetDocsPerShard`-row task and
  * parallelism grows with the data. The count is computed IN-PLAN from
  * a broadcast one-row count aggregate (integer ceil, so the same
  * arithmetic is reproducible in the DuckDB oracle), not driver-side.
  *
  * Packing quality note: hash sharding trades perfect fill for
  * parallelism — bins at each shard's tail may run short. That is the
  * standard corpus-scale tradeoff (greedy global packing would
  * serialize); bin fill converges to `1 - avg_doc/binTokens` per shard
  * either way.
  */
object Pack {

  /** Bin assignment + per-bin rollup. Returns
    * (shard, bin, n_docs, bin_tokens, first_doc). */
  def packBins(docs: DataFrame, idCol: String, nTokens: Column,
               binTokens: Long = 4096,
               targetDocsPerShard: Long = 1L << 20,
               hashSalt: Int = 3): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      nTokens.cast("long").as("n_tokens"))
    val n = base.agg(count(lit(1)).cast("long").as("n_docs_total"))
    val t = base.crossJoin(broadcast(n))
      .withColumn("n_shards",
        greatest(expr(s"(n_docs_total + ${targetDocsPerShard - 1}) div $targetDocsPerShard"),
          lit(1L)))
      .withColumn("shard", pmod(hash32(col("doc_id").cast("string"), hashSalt),
        col("n_shards")))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    t.withColumn("before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("before") / lit(binTokens.toDouble)).cast("bigint"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("bin_tokens"),
        min(col("doc_id")).as("first_doc"))
  }
}
