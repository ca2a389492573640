package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * unchanged majority of a wide table is never shuffled; full
  * payload rows are joined back only for keys whose digest says
  * something changed (the changed-key set is small, so AQE
  * broadcasts it and the join-backs are scan + broadcast-probe, no
  * payload shuffle either). The trade, measured honestly in
  * [[graft.SnapshotDiffSoak]]: each side is SCANNED twice (digest
  * pass + join-back probe), so on a single box where a tmpfs scan
  * costs the same as a local shuffle the naive full outer join wins
  * (~5 s vs ~12 s at 20 M × 420-byte rows); the digest plan is for
  * the cluster regime where the network shuffle of 2× full payload
  * bytes — not the column-pruned rescan — is the bottleneck, and for
  * snapshots wider than this fixture. Digests are compared only
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
    def digested(df: DataFrame, as: String): DataFrame =
      df.select((keys.map(col) :+ rowDigest(df, payload).as(as)): _*)

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

  /** Apply a change set (the [[diff]] output shape: key columns,
    * payload columns, `op` ∈ ('insert','update','delete')) to a
    * snapshot — the inverse of [[diff]]:
    * `applyChanges(old, diff(old, new, keys), keys) == new`.
    *
    * Keys named in the change set are REPLACED wholesale (anti-join
    * removes the old row; non-delete changes supply the new image), so
    * insert and update are the same upsert path and a delete is just
    * removal — one shuffle-free-on-the-big-side plan: the change set
    * is small by the CDC premise, so AQE broadcasts it and both the
    * anti-join and the union are scan + broadcast-probe over the
    * snapshot; the snapshot itself is never shuffled. Contract: at
    * most one change row per key (the [[diff]] output guarantees it).
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(changes.columns.contains("op"),
      s"change set needs an 'op' column, got ${changes.columns.toSeq}")
    snapshot.join(changes.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(
        changes.filter(col("op") =!= "delete").drop("op")
          .select(snapshot.columns.map(col): _*))
  }

  /** md5 row digest over `cols`. Each field is encoded null-tagged
    * and length-prefixed ("N" / "V<len>:<value>"), so field
    * boundaries and NULL-vs-empty are unambiguous; atomic types go
    * through a deterministic cast (digests are only ever compared
    * within this engine) while complex types fall back to to_json.
    * All codegen string ops — no per-row Jackson on the hot path. */
  private def rowDigest(df: DataFrame, cols: Seq[String]): Column = {
    val schema = df.schema
    val encoded = cols.map { c =>
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val atomic = schema(c).dataType match {
        case _: ArrayType | _: MapType | _: StructType => false
        case _ => true
      }
      val s = if (atomic) col(c).cast("string") else to_json(col(c))
      when(col(c).isNull, lit("|N"))
        .otherwise(concat(lit("|V"), length(s), lit(":"), s))
    }
    md5(concat(encoded: _*))
  }

  /** Per-partition rollup signature: row count plus two order-
    * independent sums of 60-bit halves of the full-row digest (keys
    * AND payload, so inserts/deletes move the signature, not just
    * updates). Sums are decimal(38,0) — commutative, partial-
    * aggregable, overflow-free below ~10²⁰ rows per partition. Equal
    * signatures ⇒ equal row multisets, under the same hash-collision
    * assumption [[diff]] already accepts for md5. Partition columns
    * are aliased with `p` so old/new signatures can join. */
  private def partitionSignature(df: DataFrame, partCols: Seq[String],
                                 p: String): DataFrame = {
    val d60 = (c: Column, off: Int) =>
      conv(substring(c, off, 15), 16, 10).cast("decimal(38,0)")
    val rd = rowDigest(df, df.columns.toSeq)
    df.select((partCols.map(col) :+ rd.as("_rd")): _*)
      .groupBy(partCols.map(col): _*)
      .agg(count(lit(1)).as(p + "n"),
        sum(d60(col("_rd"), 1)).as(p + "s1"),
        sum(d60(col("_rd"), 17)).as(p + "s2"))
      .select(partCols.map(c => col(c).as(p + c)) ++
        Seq(col(p + "n"), col(p + "s1"), col(p + "s2")): _*)
  }

  /** Partitions whose content differs between the snapshots — absent
    * on one side, or any rollup signature component unequal. Joins
    * are null-safe (`<=>`) so a NULL partition value is a matchable
    * partition like any other, not a permanently-changed one. Output:
    * the `partCols` of each changed partition. */
  def changedPartitions(oldSnap: DataFrame, newSnap: DataFrame,
                        partCols: Seq[String]): DataFrame = {
    require(partCols.nonEmpty, "need at least one partition column")
    val os = partitionSignature(oldSnap, partCols, "_o_")
    val ns = partitionSignature(newSnap, partCols, "_n_")
    val on = partCols.map(c => os(s"_o_$c") <=> ns(s"_n_$c")).reduce(_ && _)
    os.join(ns, on, "full_outer")
      .filter(!(col("_o_n") <=> col("_n_n") &&
        col("_o_s1") <=> col("_n_s1") && col("_o_s2") <=> col("_n_s2")))
      .select(partCols.map(c =>
        coalesce(col(s"_o_$c"), col(s"_n_$c")).as(c)): _*)
  }

  /** [[diff]] with a partition short-circuit: unchanged partitions of
    * a partition-keyed snapshot (e.g. the date-partitioned layouts
    * [[VersionedStaging]] publishes) are eliminated by a rollup-
    * signature compare BEFORE the row-level classification join, so
    * their rows are never shuffled — at 100 TB a daily snapshot diff
    * touches the handful of recent partitions that actually moved,
    * not every historical date. The signature pass is a narrow scan +
    * partial-agg per side (count + digest sums per partition), and
    * the changed-partition set is small by assumption, so AQE
    * broadcasts it and the semi-joins are scan + broadcast-probe.
    *
    * Identity: output == [[diff]](oldSnap, newSnap, keys) — a key can
    * only appear in the diff if some row bearing it changed, and any
    * such row perturbs its partition's signature on at least one side
    * (rows that move BETWEEN partitions perturb both). `partCols` may
    * overlap `keys` and/or payload; both snapshots must share one
    * schema (the [[diff]] contract).
    */
  def diffPartitioned(oldSnap: DataFrame, newSnap: DataFrame,
                      keys: Seq[String], partCols: Seq[String]): DataFrame = {
    require(partCols.forall(oldSnap.columns.contains),
      s"partition cols $partCols not all present in ${oldSnap.columns.toSeq}")
    val changed = changedPartitions(oldSnap, newSnap, partCols)
    def onlyChanged(df: DataFrame): DataFrame =
      df.join(changed, partCols.map(c => df(c) <=> changed(c)).reduce(_ && _),
        "left_semi")
    diff(onlyChanged(oldSnap), onlyChanged(newSnap), keys)
  }
}
