package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — derive a change-data-capture stream
  * (insert / update / delete rows) from two keyed snapshots of the
  * same table. Extension operator (SURVEY §7.1): the batch complement
  * of the streaming merge path (s2/J2) and the d13 incremental-ingest
  * anti-join — reference analogue: the tmp-vs-target row diffing the
  * merge step performs implicitly (`sql/load/03_merge.sql:1-33`).
  *
  * 100-TB design: the classification join runs on NARROW frames —
  * key columns plus a 128-bit md5 digest of the payload — so the
  * unchanged majority of a wide table is never shuffled twice; full
  * payload rows are joined back only for keys whose digest says
  * something changed. With 99% of a snapshot typically unchanged,
  * the heavy shuffle carries ~1% of the bytes of the naive
  * full-outer-join-on-everything plan. Digests are compared only
  * WITHIN this engine (old side vs new side), never against an
  * external engine, so cross-engine digest portability is not
  * required; an md5 collision between a row's old and new payload
  * would misclassify that update as unchanged — the same 2⁻¹²⁸
  * assumption as d1's content-hash dedup, accepted there.
  *
  * Contract: `keys` is a primary key in EACH snapshot (at most one
  * row per key per side) and both frames share one schema.
  */
object SnapshotDiff {

  /** Change set between two snapshots. Output: key columns, then the
    * non-key payload columns (new-side values for insert/update, the
    * old-side values for delete — i.e. the row you would apply), then
    * `op` ∈ ('insert','update','delete'). Unchanged keys are absent.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(oldSnap.columns.toSeq == newSnap.columns.toSeq,
      s"snapshot schemas differ: ${oldSnap.columns.toSeq} vs ${newSnap.columns.toSeq}")
    val payload = oldSnap.columns.filterNot(keys.contains).toSeq
    require(payload.nonEmpty, "snapshots have no payload columns")

    // Narrow classification frames: keys + one digest column.
    // to_json of a struct is deterministic for a fixed schema, and
    // distinguishes NULL from any string value.
    def digested(df: DataFrame, as: String): DataFrame =
      df.select((keys.map(col) :+
        md5(to_json(struct(payload.map(col): _*))).as(as)): _*)

    val classified = digested(oldSnap, "_od")
      .join(digested(newSnap, "_nd"), keys, "full_outer")
      .withColumn("op",
        when(col("_od").isNull, lit("insert"))
          .when(col("_nd").isNull, lit("delete"))
          .when(col("_od") =!= col("_nd"), lit("update")))
      .filter(col("op").isNotNull)
      .select((keys.map(col) :+ col("op")): _*)

    // Payload join-back, bounded by the changed-key count: the new
    // side supplies insert/update rows, the old side supplies the
    // deleted row images.
    val out = (keys ++ payload).map(col) :+ col("op")
    classified.filter(col("op") =!= "delete").join(newSnap, keys)
      .select(out: _*)
      .unionByName(
        classified.filter(col("op") === "delete").join(oldSnap, keys)
          .select(out: _*))
  }
}
