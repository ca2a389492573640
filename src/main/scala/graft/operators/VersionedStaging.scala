package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The versioned-staging protocol shared by the batch pipeline and the
  * streaming merge sink: each merge writes a NEW `v%06d` directory
  * (never overwrite-while-reading), and readers take the newest
  * COMPLETE version.
  *
  * - Completeness: a version counts only if its `_SUCCESS` marker
  *   exists, so a crash mid-write can never be picked up as the merge
  *   target (a partial snapshot would silently drop rows).
  * - Ordering: versions compare NUMERICALLY (parsed from the dir name),
  *   not lexicographically — `v1000000` must sort after `v999999` even
  *   though the padding is exhausted.
  * - Idempotence: an optional `batchId` is recorded as a
  *   `_BATCH-<id>` marker; a replayed micro-batch (same id as the
  *   current latest version) is skipped instead of stacking a duplicate
  *   snapshot.
  */
object VersionedStaging {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionOf(path: String): Option[Int] =
    path.split("/").last.stripPrefix("v").toIntOption

  /** Newest COMPLETE (_SUCCESS-marked) version dir, by numeric order. */
  def latestComplete(spark: SparkSession, root: String): Option[String] = {
    val f = fs(spark, root)
    val matches = Option(f.globStatus(new Path(s"$root/v*")))
      .getOrElse(Array.empty)
    matches.map(_.getPath.toString)
      .filter(p => versionOf(p).isDefined &&
        f.exists(new Path(p, "_SUCCESS")))
      .sortBy(versionOf(_).get)
      .lastOption
  }

  /** Batch id recorded for a version, if any. */
  def batchIdOf(spark: SparkSession, versionDir: String): Option[Long] = {
    val f = fs(spark, versionDir)
    Option(f.globStatus(new Path(s"$versionDir/_BATCH-*")))
      .getOrElse(Array.empty)
      .headOption
      .flatMap(_.getPath.getName.stripPrefix("_BATCH-").toLongOption)
  }

  /** Publish `df` as the next version under `root`. Returns the new
    * version path, or None if `batchId` matches the current version's
    * (exact replay — skipped). The single owner of the version-advance
    * + marker protocol; every writer goes through here.
    *
    * Crash safety: data AND batch-id marker are staged in a hidden
    * `.tmp-*` dir (invisible to the `v*` glob) and renamed into place
    * in one step — a version can never exist complete-but-markerless,
    * which for non-idempotent combiners (incremental marts) would turn
    * a micro-batch replay into a double-count. */
  def publish(spark: SparkSession, root: String, df: DataFrame,
              batchId: Option[Long] = None): Option[String] =
    publishFrom(spark, root, latestComplete(spark, root), df, batchId)

  /** [[publish]] with the current-version listing already computed —
    * callers that listed for their own read (mergeInto) pass it in so a
    * long-lived stream doesn't pay two O(versions) listings per batch. */
  private def publishFrom(spark: SparkSession, root: String,
                          current: Option[String], df: DataFrame,
                          batchId: Option[Long]): Option[String] = {
    if (batchId.isDefined && current.exists(c => batchIdOf(spark, c) == batchId))
      return None
    val next = current.flatMap(versionOf).getOrElse(0) + 1
    val dest = f"$root/v$next%06d"
    val tmp = f"$root/.tmp-v$next%06d"
    df.write.mode("overwrite").parquet(tmp)
    batchId.foreach { id =>
      fs(spark, tmp).create(new Path(tmp, s"_BATCH-$id"), true).close()
    }
    // Hadoop FS signals failure by RETURNING false, not throwing; a
    // swallowed failure here would let a streaming checkpoint commit a
    // batch whose version was never created (silent data loss)
    val f = fs(spark, dest)
    if (f.exists(new Path(dest)) && !f.delete(new Path(dest), true))
      throw new java.io.IOException(s"failed to delete stale partial $dest")
    if (!f.rename(new Path(tmp), new Path(dest)))
      throw new java.io.IOException(s"failed to rename $tmp to $dest")
    Some(dest)
  }

  /** Storage lifecycle: delete every complete version older than the
    * newest `keep` ones, plus any orphaned `.tmp-*` staging dirs (a
    * crash between write and rename leaves one; it is invisible to
    * readers but holds space). Never touches the newest complete
    * version. Returns the deleted paths. At 100 TB this is the
    * history-retention knob — unbounded version history is unbounded
    * storage, the same reason table formats ship VACUUM. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Seq[String] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val f = fs(spark, root)
    val complete = Option(f.globStatus(new Path(s"$root/v*")))
      .getOrElse(Array.empty)
      .map(_.getPath.toString)
      .filter(p => versionOf(p).isDefined && f.exists(new Path(p, "_SUCCESS")))
      .sortBy(versionOf(_).get)
    val doomedVersions = complete.dropRight(keep)
    val orphans = Option(f.globStatus(new Path(s"$root/.tmp-v*")))
      .getOrElse(Array.empty)
      .map(_.getPath.toString)
      // an in-flight writer's tmp dir is NOT an orphan: only collect
      // tmp dirs whose target version already exists (rename happened
      // via a retry path) or that sort at/below the newest version
      .filter(p => versionOf(p.replace(".tmp-", ""))
        .exists(v => complete.lastOption.flatMap(versionOf).exists(_ >= v)))
    val doomed = doomedVersions ++ orphans
    doomed.foreach { p =>
      // Hadoop FS signals failure by RETURNING false, not throwing
      if (!f.delete(new Path(p), true))
        throw new java.io.IOException(s"vacuum failed to delete $p")
    }
    doomed.toSeq
  }

  /** Compaction: rewrite the newest complete version into
    * `numPartitions` files and publish it as the NEXT version (readers
    * never see a half-compacted snapshot; the old version remains until
    * [[vacuum]]). Micro-batch merges accrete small part files — at
    * cluster scale file-count, not byte-count, is what kills scan
    * planning. Returns the new version path, or None if there is
    * nothing to compact. */
  def compact(spark: SparkSession, root: String,
              numPartitions: Int = 1): Option[String] =
    latestComplete(spark, root).flatMap { current =>
      val df = spark.read.parquet(current).repartition(numPartitions)
      publishFrom(spark, root, Some(current), df, batchId = None)
    }

  /** Merge `batch` into the staging at `root`: read the newest complete
    * version as target, keep-newest merge, publish the next version.
    * Returns the new version path, or None on batch-id replay. */
  def mergeInto(spark: SparkSession, root: String, batch: DataFrame,
                keys: Seq[String], versionCol: String,
                batchId: Option[Long] = None): Option[(String, Merge.MergeResult)] = {
    val current = latestComplete(spark, root)
    if (batchId.isDefined && current.exists(c => batchIdOf(spark, c) == batchId))
      return None // checked here too: Merge.merge below runs an eager count
    val target = current.map(spark.read.parquet(_)).getOrElse(batch.limit(0))
    val result = Merge.merge(target, batch, keys, versionCol)
    publishFrom(spark, root, current, result.merged, batchId)
      .map(dest => (dest, result))
  }
}
