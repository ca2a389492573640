package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed upsert (merge) — SURVEY §2.E J1+J2.
  *
  * Reference semantics (`/root/reference/sql/load/03_merge.sql`):
  *   - insert batch rows whose key is absent from the target (J1,
  *     `ON CONFLICT DO NOTHING`);
  *   - update target rows where the batch row is strictly newer
  *     (`s.extracted_at > t.extracted_at`, J2) — equal versions keep the
  *     target row;
  *   - report (inserted, updated) counts (`03_merge.sql:30-32`).
  *
  * Spark-first formulation: `target ∪ batch` tagged by source, then
  * keep-newest-per-key with target-wins tie-break ([[Dedup.keepNewest]]).
  * One union (no shuffle) + one hash-partitioned window — strictly less
  * data movement than the join-then-union alternative, and AQE handles
  * the exchange sizing. Counts are a separate single-aggregate plan
  * ([[Merge.countsPlan]]: batch left-joined to a two-column projection
  * of target), so `merge` runs two jobs: the window merge and the
  * counts join. At cluster scale the target side would be a bucketed
  * table on the key, making its exchange a no-op in both plans.
  */
object Merge {

  final case class MergeResult(merged: DataFrame, inserted: Long, updated: Long)

  private val SRC = "__src" // 0 = target (wins ties), 1 = batch

  /** Canonicalize a batch that may carry duplicate keys: keep the newest
    * version per key, ties broken by a deterministic whole-row hash.
    * Without this, counts would double-count duplicate-key batch rows
    * and the surviving payload for a (key, version) tie would vary
    * run-to-run. (The reference pre-dedups batches in its transform
    * phase; generic callers — e.g. the streaming merge — may not.) */
  private def canonBatch(batch: DataFrame, keys: Seq[String],
                         versionCol: String): DataFrame =
    Dedup.keepNewest(batch, keys, col(versionCol),
      xxhash64(struct(batch.columns.toIndexedSeq.map(col): _*)))

  /** Merged relation only (no counts) — single lazy plan, no actions. */
  def merged(target: DataFrame, batch: DataFrame, keys: Seq[String],
             versionCol: String): DataFrame = {
    val tagged = target.withColumn(SRC, lit(0))
      .unionByName(canonBatch(batch, keys, versionCol).withColumn(SRC, lit(1)))
    Dedup.keepNewest(tagged, keys, col(versionCol), col(SRC)).drop(SRC)
  }

  /** Lazy one-row (inserted, updated) counts plan — same semantics as
    * [[merge]] but returned as a DataFrame (for the driver contract). */
  def countsPlan(target: DataFrame, batch: DataFrame, keys: Seq[String],
                 versionCol: String): DataFrame = {
    val t = target.select(keys.map(col) :+ col(versionCol).as("__tv"): _*)
    canonBatch(batch, keys, versionCol).join(t, keys, "left")
      .agg(
        coalesce(sum(when(col("__tv").isNull, 1L).otherwise(0L)), lit(0L))
          .cast("bigint").as("inserted"),
        coalesce(sum(when(col("__tv").isNotNull && col(versionCol) > col("__tv"), 1L)
          .otherwise(0L)), lit(0L)).cast("bigint").as("updated"))
  }

  /** Merge with inserted/updated counts (runs one counting action).
    * `inserted` = batch keys absent from target; `updated` = batch rows
    * strictly newer than the target row for an existing key. */
  def merge(target: DataFrame, batch: DataFrame, keys: Seq[String],
            versionCol: String): MergeResult = {
    val m = merged(target, batch, keys, versionCol)
    val counts = countsPlan(target, batch, keys, versionCol).collect()(0)
    MergeResult(m, counts.getLong(0), counts.getLong(1))
  }
}
