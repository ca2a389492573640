package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming forms of the engine's batch operators.
  *
  * The reference's "stream" is a sequence of timestamped batch files
  * (`/root/reference/README.md:113-124`): one extraction run = one file,
  * consumed by the next phase. That maps exactly onto Spark's file
  * source — each new file is a micro-batch; `Trigger.AvailableNow`
  * reproduces the reference's run-to-completion semantics.
  *
  * Scale notes: the file source tracks processed files in the checkpoint
  * log, giving the same exactly-once, idempotent-rerun behavior the
  * reference gets from its PK merge; watermarks bound the window state
  * so the aggregation state store stays O(open windows), not O(stream).
  */
object StreamingJobs {

  /** Tumbling event-time aggregation with a watermark — the streaming
    * twin of [[graft.operators.Windows.tumbling]]. Caller starts it with
    * `.writeStream` (see StreamingSpec for the AvailableNow harness). */
  def tumblingCounts(spark: SparkSession, srcDir: String, schema: StructType,
                     tsCol: String, keyCol: String, width: String,
                     watermark: String = "2 hours"): DataFrame =
    spark.readStream.schema(schema).parquet(srcDir)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total"))

  /** Streaming keyed merge: each arriving file micro-batch is upserted
    * into versioned staging via the shared
    * [[graft.operators.VersionedStaging]] protocol inside `foreachBatch`
    * — the streaming form of the reference's load phase. The batch id is
    * recorded per version, so a micro-batch replayed after a failure
    * between write and checkpoint commit is skipped, not duplicated; the
    * _SUCCESS completeness check means a crash mid-write can never
    * become the next merge target. Returns the started query; callers
    * await/stop it. */
  def streamingMerge(spark: SparkSession, srcDir: String, schema: StructType,
                     stagingRoot: String, keys: Seq[String], versionCol: String,
                     checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.VersionedStaging.mergeInto(
          batch.sparkSession, stagingRoot, batch.toDF(),
          keys, versionCol, batchId = Some(batchId))
        ()
      }
      .start()

  /** Streaming incremental mart maintenance: each micro-batch is
    * partially aggregated ([[graft.operators.Marts.dailyPartial]]) and
    * COMBINED with the current mart state — per batch the work is
    * O(batch) + O(mart keys), never a re-aggregation of history (the
    * reference's full refresh, and the only refresh shape that survives
    * 100 TB of accumulated stream). State lives in the same versioned
    * protocol as the staging merge. */
  def streamingIncrementalMart(spark: SparkSession, srcDir: String,
                               schema: StructType, martRoot: String,
                               checkpoint: String,
                               maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    graft.Tables.normalizeNanos(reader.parquet(srcDir))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val newPartial = graft.operators.Marts.dailyPartial(batch.toDF())
        val combined = graft.operators.VersionedStaging.latestComplete(s, martRoot)
          .map(c => graft.operators.Marts.combinePartials(s.read.parquet(c), newPartial))
          .getOrElse(newPartial)
        graft.operators.VersionedStaging.publish(s, martRoot, combined,
          batchId = Some(batchId))
        ()
      }
      .start()
  }

  /** Streaming CDC APPLY — the consumer half of the q77/q81 snapshot
    * diff: a stream of change rows (key cols + payload cols + `op` ∈
    * ('insert','update','delete'), the [[graft.operators.SnapshotDiff.diff]]
    * output shape) is applied micro-batch by micro-batch to a keyed
    * table held in versioned staging, so
    * `applyCdcStream(diff(old, new))` over a root seeded with `old`
    * converges to `new` — the roundtrip identity the s9 gate checks.
    *
    * Each batch is one [[graft.operators.SnapshotDiff.applyChanges]]
    * (anti-join removal + upsert union: the change batch is small by
    * the CDC premise, so AQE broadcasts it and the table is never
    * shuffled) published as a NEW version — the same atomic,
    * replay-idempotent protocol as [[streamingMerge]], extended with
    * delete semantics the reference's merge lacks
    * (`/root/reference/sql/load/03_merge.sql:1-33` only upserts).
    * Deterministic under any batch split that keeps each key's changes
    * in one batch: diff emits ≤ 1 row per key, so batches commute.
    *
    * 100-TB design: per batch the work is O(batch) + one broadcast-
    * probe pass over the snapshot — at scale the rewrite cost says
    * "partition the staging layout and rewrite only changed
    * partitions", which is exactly [[graft.operators.SnapshotDiff
    * .changedPartitions]] composed with this loop; the gate keeps the
    * unpartitioned form for oracle exactness. */
  def applyCdcStream(spark: SparkSession, srcDir: String, schema: StructType,
                     stateRoot: String, keys: Seq[String],
                     checkpoint: String,
                     maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val current = graft.operators.VersionedStaging.latestComplete(s, stateRoot)
          .map(p => s.read.parquet(p))
          .getOrElse(sys.error(s"applyCdcStream: $stateRoot not seeded"))
        graft.operators.VersionedStaging.publish(s, stateRoot,
          graft.operators.SnapshotDiff.applyChanges(current, batch.toDF(), keys),
          batchId = Some(batchId))
        ()
      }
      .start()
  }

  /** Streaming incremental MinHash-LSH near-dup — the ingest-dedup
    * production shape (r9 verdict item 6): a persisted
    * [[graft.operators.DedupSuite.minhashIndex]] over the corpus is
    * PROBED and GROWN from a document stream via `foreachBatch`. Per
    * micro-batch: (1) probe the current index with
    * [[graft.operators.DedupSuite.incrementalMinhashNearDups]] — the
    * batch is shingled/signed once, candidates come from shared (band,
    * band_hash) buckets, exact-Jaccard verified; (2) append the found
    * pairs under `pairsDir/batch=<id>`; (3) publish index ∪
    * minhashIndex(batch) as the next version. Docs arriving in batch
    * t are therefore deduped against the corpus AND every earlier
    * batch — the cross-batch pairs are the part a fixed-index probe
    * (d19) cannot see, and the s11 gate plants clone pairs split
    * across batches to make exactly that observable.
    *
    * Replay safety: a crash between the index publish and the
    * checkpoint commit replays the batch; the `_BATCH` marker on the
    * latest version detects it and the whole step is SKIPPED —
    * re-probing against the already-grown index would emit wrong
    * pairs (self-matches of the batch against its own index rows).
    * The pairs write is per-batch-dir overwrite, so the
    * crash-before-publish replay (which recomputes against the same
    * index) is idempotent too.
    *
    * 100-TB design: per-batch cost is the batch's own shingle/sign
    * pass plus hash joins against the index — the corpus is never
    * re-shingled (the d19 invariant, now maintained continuously).
    * The index append is a metadata-cheap versioned publish; at real
    * scale the union-write becomes an append-only table partition
    * plus periodic [[graft.operators.VersionedStaging.compact]]. */
  def streamingIncrementalNearDup(spark: SparkSession, srcDir: String,
                                  schema: StructType, indexRoot: String,
                                  pairsDir: String, checkpoint: String,
                                  maxFilesPerTrigger: Option[Int] = None,
                                  n: Int = 3, k: Int = 16, bands: Int = 4,
                                  threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(nf => reader.option("maxFilesPerTrigger", nf))
    reader.parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val current = graft.operators.VersionedStaging.latestComplete(s, indexRoot)
          .getOrElse(sys.error(s"streamingIncrementalNearDup: $indexRoot not seeded"))
        if (!graft.operators.VersionedStaging.batchIdOf(s, current).contains(batchId)) {
          val index = s.read.parquet(current)
          val b = batch.toDF()
          graft.operators.DedupSuite.incrementalMinhashNearDups(
            index, b, "doc_id", "text", n, k, bands, threshold)
            .write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
          graft.operators.VersionedStaging.publish(s, indexRoot,
            index.unionByName(
              graft.operators.DedupSuite.minhashIndex(b, "doc_id", "text", n, k, bands)),
            batchId = Some(batchId))
        }
        ()
      }
      .start()
  }

  /** Streaming ANN serving (s12): a stream of query vectors scored
    * per micro-batch against a STATIC precomputed PQ index (codebook
    * + code table) — the online form of e9. Each batch runs the exact
    * batch pqScore, so the accumulated output equals the batch run
    * over all queries (each query arrives whole in one batch; top-k
    * is per-query, so batching cannot change it). The stream holds NO
    * state and never shuffles the code table — at 100 TB/day of
    * queries this is the s10 broadcast-enrichment shape pointed at a
    * vector index; index refresh is a VersionedStaging republish,
    * orthogonal to the stream. */
  def streamingAnnServe(spark: SparkSession, srcDir: String,
                        schema: StructType, codebook: org.apache.spark.sql.DataFrame,
                        codes: org.apache.spark.sql.DataFrame, outDir: String,
                        checkpoint: String, k: Int, m: Int, dims: Int,
                        maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(nf => reader.option("maxFilesPerTrigger", nf))
    reader.parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val qtab = graft.operators.Similarity.pqQueryTable(
          batch.toDF(), codebook, "vec_id", "embedding", m, dims)
        graft.operators.Similarity.pqScore(codes, qtab, k)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** Apply one vector micro-batch to a persisted IVF index (the
    * [[graft.operators.Similarity.buildIvfIndex]] layout) exactly
    * once, CRASH-SAFE AT EVERY STEP — parquet append has no natural
    * idempotency and a bare marker-after-append leaves a window
    * (append committed, marker not yet written) where a replayed
    * micro-batch double-appends. The protocol closes every window:
    *
    *  1. `_batch_<id>` marker exists → already applied, skip.
    *  2. Stage the assigned batch under `.staging_batch_<id>` with
    *     mode=overwrite. Spark commits `_SUCCESS` LAST, so a staging
    *     dir without `_SUCCESS` is a crashed attempt and is simply
    *     overwritten; one WITH `_SUCCESS` is frozen and REUSED on
    *     replay (never rewritten — its file names are now the
    *     batch's identity).
    *  3. Copy each staged data file into its centroid partition under
    *     the DETERMINISTIC name `batch<id>-<stagedFileName>` with
    *     REPLACE_EXISTING: a re-copy after a partial crash overwrites
    *     the same targets byte-identically — no orphans, no
    *     duplicates, because the name set is fixed by the committed
    *     staging.
    *  4. Create the marker (the commit point), THEN delete staging.
    *
    * Any crash replays to the same final state: before staging
    * `_SUCCESS` → clean restage; between staging and marker →
    * idempotent re-copy; after marker → step 1 skips (and leaked
    * staging is swept). Returns whether the batch was applied
    * (false = replay skip). */
  def appendIvfBatchIdempotent(indexPath: String,
                               centroids: org.apache.spark.sql.DataFrame,
                               batch: org.apache.spark.sql.DataFrame,
                               batchId: Long,
                               autoCompactTrigger: Int = 24): Boolean = {
    import java.nio.file.Paths
    val staging = Paths.get(indexPath, s".staging_batch_$batchId")
    val applied = applyBatchIdempotent(
        Paths.get(indexPath, s"_batch_$batchId"), staging) { () =>
      graft.operators.Similarity.stageIvfBatch(
        batch, staging.toString, centroids, "vec_id", "embedding")
    } { () => promoteStagedIvfBatch(indexPath, batchId) }
    // self-scheduled maintenance AFTER the batch's marker is durable:
    // a compaction can then never interleave a promoted-but-markerless
    // replay window (batch N replays before N+1 ever runs, and the
    // fused compaction ignores dot-dirs, so a crashed sibling's
    // staging is untouched). Row-identical — the e10 rebuild oracle
    // and s13 gate serve from compacted stores already. ≤ 0 disables.
    if (applied && autoCompactTrigger > 0 &&
        graft.operators.StoreCompaction.needsMaintenance(indexPath,
          autoCompactTrigger)) {
      graft.operators.StoreCompaction.compactStoreFused(
        batch.sparkSession, indexPath, "centroid_id")
      ()
    }
    applied
  }

  /** Step 3 of [[appendIvfBatchIdempotent]]'s protocol, exposed so
    * the spec can replay it against a crashed (marker-less) apply:
    * copy every staged `centroid_id=X/part-*.parquet` into the live
    * index partition under `batch<id>-<name>` with REPLACE_EXISTING. */
  private[graft] def promoteStagedIvfBatch(indexPath: String,
                                           batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val staging = Paths.get(indexPath, s".staging_batch_$batchId")
    require(Files.exists(staging.resolve("_SUCCESS")),
      s"staging for batch $batchId is not committed")
    // Files.list mandates a close (javadoc) — an unclosed stream
    // leaks a directory fd until GC
    val s = Files.list(staging)
    val parts = try s.iterator().asScala.toList finally s.close()
    parts.filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("centroid_id="))
      .foreach { partDir =>
        promoteFiles(partDir, Paths.get(indexPath, partDir.getFileName.toString),
          s"batch$batchId")
      }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    graft.operators.StoreFiles.deleteRecursively(p)

  /** The committed-staging exactly-once protocol, shared by every
    * streaming ingest twin (IVF s13, ExactSubstr s14, quantile store
    * s15, boilerplate s16) AND the batch store folds — implementation
    * and full protocol notes in
    * [[graft.operators.StoreFiles.applyBatchIdempotent]]. */
  private[graft] def applyBatchIdempotent(
      marker: java.nio.file.Path, staging: java.nio.file.Path)(
      stage: () => Unit)(promote: () => Unit): Boolean =
    graft.operators.StoreFiles.applyBatchIdempotent(marker, staging)(
      stage)(promote)

  /** Copy every `*.parquet` under `srcDir` into `dstDir` under the
    * deterministic name `<stamp>-<file>` with REPLACE_EXISTING — the
    * promote step's shared file move
    * ([[graft.operators.StoreFiles.promoteFiles]]). */
  private[graft] def promoteFiles(srcDir: java.nio.file.Path,
                                  dstDir: java.nio.file.Path,
                                  stamp: String): Unit =
    graft.operators.StoreFiles.promoteFiles(srcDir, dstDir, stamp)

  /** Fold one document micro-batch into a persisted ExactSubstr
    * window-key store (the [[graft.operators.DedupSuite.exactSubstrBuildStore]]
    * layout) exactly once — [[appendIvfBatchIdempotent]]'s
    * committed-staging protocol applied to a fold that must publish
    * THREE artifacts atomically-by-replay: the store delta (bucket
    * partitions), the append-only `_meta` high-water row, and the
    * batch's cleaned output (accumulated under `outPath`) — plus, on
    * a bloom-maintained store, the delta's bloom-sidecar rows as a
    * fourth staged-and-promoted artifact (see [[stageSubstrFold]]'s
    * coverage argument). The plain
    * [[graft.operators.DedupSuite.exactSubstrFold]] is crash-redo —
    * a replayed fold double-appends its delta (counts are not
    * idempotent); here every window closes:
    *
    *  1. `_substr_batch_<id>` marker in the store → applied, skip.
    *  2. Staging without its commit file is a crashed attempt —
    *     recompute from the LIVE store (never touched before step 3)
    *     and stage delta/out/meta; then create `_SUCCESS` (written
    *     last, so its presence freezes the staging — replay reuses
    *     it verbatim, never recomputes against a half-promoted
    *     store).
    *  3. Promote with DETERMINISTIC names `sbatch<id>-<file>` +
    *     REPLACE_EXISTING into the store's bucket partitions, the
    *     meta dir (append-only — readers max over rows), and
    *     `outPath`: a partial-crash re-copy overwrites the same
    *     targets byte-identically.
    *  4. Marker (the commit point), then sweep staging.
    *
    * Returns whether the batch was applied (false = replay skip). */
  def foldSubstrBatchIdempotent(spark: SparkSession, storePath: String,
                                outPath: String, batch: org.apache.spark.sql.DataFrame,
                                batchId: Long, l: Int, nBuckets: Int,
                                hashKeys: Boolean): Boolean = {
    import java.nio.file.Paths
    val staging = Paths.get(storePath, s".substr_staging_$batchId")
    applyBatchIdempotent(
        Paths.get(storePath, s"_substr_batch_$batchId"), staging) { () =>
      stageSubstrFold(spark, storePath, staging, batch, l, nBuckets,
        hashKeys)
    } { () => promoteStagedSubstrFold(storePath, outPath, batchId) }
  }

  /** Step 2 of [[foldSubstrBatchIdempotent]]: compute the fold against
    * the LIVE (not-yet-mutated) store and stage all three artifacts,
    * committing with a hand-written `_SUCCESS` LAST — a staging dir
    * without it is a crashed attempt and is restaged from scratch.
    * Exposed for the spec's crash-window replays. */
  private[graft] def stageSubstrFold(spark: SparkSession, storePath: String,
                                     staging: java.nio.file.Path,
                                     batch: org.apache.spark.sql.DataFrame,
                                     l: Int, nBuckets: Int,
                                     hashKeys: Boolean): Unit = {
    deleteRecursively(staging)
    // AQE-off clone: the staged fold is a handful of batch-sized
    // actions whose per-exchange stage-jobs are fixed-latency tax
    // (StoreCompaction.quietSession); clone-local, so concurrent
    // streams on the caller's session are untouched
    val qs = graft.operators.StoreCompaction.quietSession(spark)
    val (delta, out, newMax) = graft.operators.DedupSuite
      .computeSubstrFold(qs, storePath,
        org.apache.spark.sql.GraftColumnBridge.onSession(qs, batch),
        "doc_id", "text", l, nBuckets, hashKeys)
    // delta and out derive from the fold's checkpointed join — fan
    // out as concurrent jobs; `_SUCCESS` is written strictly last.
    // Bloom-maintained stores get this fold's delta blooms STAGED as
    // a third concurrent action and promoted with the delta: the
    // sidecar's coverage contract survives every crash window because
    // the batch isn't marked applied until the promote step copied
    // BOTH the delta and its blooms, and the stream replays the batch
    // (single-maintainer) before any later fold could consult the
    // sidecar against the new keys.
    graft.operators.Par.run(Seq(
      () => delta.write.partitionBy("bucket") // pre-clustered by bucket
        .parquet(staging.resolve("delta").toString),
      () => out.write.parquet(staging.resolve("out").toString))
      ++ (if (graft.operators.BloomSide.maintained(storePath))
            Seq[() => Unit](() => graft.operators.BloomSide.stageDelta(
              delta.select(org.apache.spark.sql.functions.col("bucket"),
                org.apache.spark.sql.functions.col("wkey")),
              staging.resolve("bloom").toString, "bucket", "wkey"))
          else Nil))
    graft.operators.StoreMeta.writeFile(spark,
      staging.resolve("meta").toString,
      graft.operators.DedupSuite.substrMetaFields(newMax, l, nBuckets,
        hashKeys))
    java.nio.file.Files.createFile(staging.resolve("_SUCCESS"))
  }

  /** Step 3 of [[foldSubstrBatchIdempotent]]: copy the committed
    * staging's files into the live store's bucket partitions, the
    * `_meta` dir, and the accumulated output dir under DETERMINISTIC
    * `sbatch<id>-<name>` names with REPLACE_EXISTING — a partial-crash
    * re-copy overwrites the same targets byte-identically. Exposed for
    * the spec's crash-window replays. */
  private[graft] def promoteStagedSubstrFold(storePath: String,
                                             outPath: String,
                                             batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val staging = Paths.get(storePath, s".substr_staging_$batchId")
    require(Files.exists(staging.resolve("_SUCCESS")),
      s"substr staging for batch $batchId is not committed")
    val stamp = s"sbatch$batchId"
    val s = Files.list(staging.resolve("delta"))
    val parts = try s.iterator().asScala.toList finally s.close()
    parts.filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("bucket="))
      .foreach { bdir =>
        promoteFiles(bdir, Paths.get(storePath, bdir.getFileName.toString),
          stamp)
      }
    promoteFiles(staging.resolve("meta"), Paths.get(s"${storePath}_meta"),
      stamp)
    promoteFiles(staging.resolve("out"), Paths.get(outPath), stamp)
    // staged bloom deltas (present iff the store is bloom-maintained)
    // land in the live sidecar under the same stamp discipline
    graft.operators.BloomSide.promoteStaged(staging.resolve("bloom"),
      storePath, stamp)
  }

  /** Streaming incremental ExactSubstr ingest (s14): a stream of
    * MONOTONICALLY-ID'd document batches folds into the persisted
    * window-key store, each micro-batch emitting its own cleaned
    * output — the d26 fold with [[foldSubstrBatchIdempotent]]'s
    * exactly-once replay protocol. The corpus is never re-windowed:
    * per batch the store join touches only the batch's own crc32
    * buckets, and because ids are monotone the accumulated outputs
    * ∪-equal a full ExactSubstr recompute over corpus ∪ batches —
    * the s14 gate reads the accumulated `outPath` against d25's
    * full-pipeline oracle. */
  def streamingSubstrIngest(spark: SparkSession, srcDir: String,
                            schema: StructType, storePath: String,
                            outPath: String, checkpoint: String,
                            l: Int, nBuckets: Int, hashKeys: Boolean,
                            maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(nf => reader.option("maxFilesPerTrigger", nf))
    reader.parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        foldSubstrBatchIdempotent(spark, storePath, outPath,
          batch.toDF(), batchId, l, nBuckets, hashKeys)
        ()
      }
      .start()
  }

  /** Fold one micro-batch's cell counts into a persisted quantile
    * store ([[graft.operators.Quantiles.buildQuantileStore]] layout)
    * exactly once — the committed-staging protocol around a
    * single-artifact delta. Counts are associative and
    * order-independent, so batches commute and need no ordering
    * contract; what the protocol buys is REPLAY safety (a re-run
    * batch must not double-count). Returns whether the batch was
    * applied. */
  def foldQuantileBatchIdempotent(spark: SparkSession, storePath: String,
                                  batch: org.apache.spark.sql.DataFrame,
                                  grp: org.apache.spark.sql.Column,
                                  value: org.apache.spark.sql.Column,
                                  batchId: Long): Boolean = {
    import java.nio.file.{Files, Paths}
    val staging = Paths.get(storePath, s".qstore_staging_$batchId")
    applyBatchIdempotent(
        Paths.get(storePath, s"_qbatch_$batchId"), staging) { () =>
      deleteRecursively(staging)
      graft.operators.Quantiles.stageQuantileDelta(spark, storePath,
        batch, grp, value, staging.resolve("delta").toString)
      Files.createFile(staging.resolve("_SUCCESS"))
    } { () =>
      require(Files.exists(staging.resolve("_SUCCESS")),
        s"quantile staging for batch $batchId is not committed")
      promoteFiles(staging.resolve("delta"), Paths.get(storePath),
        s"qbatch$batchId")
    }
  }

  /** Streaming incremental quantile-store ingest (s15): a stream of
    * (group, value) batches folds additive cell-count deltas into the
    * persisted store — each micro-batch exactly once via
    * [[foldQuantileBatchIdempotent]]. The corpus is never rescanned;
    * after the stream drains, [[graft.operators.Quantiles.quantilesFromStore]]
    * serves exact quantiles whose global ranks come from the
    * stream-grown store alone. */
  def streamingQuantileIngest(spark: SparkSession, srcDir: String,
                              schema: StructType, storePath: String,
                              checkpoint: String, grpCol: String,
                              valueCol: String,
                              maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(nf => reader.option("maxFilesPerTrigger", nf))
    reader.parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        foldQuantileBatchIdempotent(spark, storePath, batch.toDF(),
          org.apache.spark.sql.functions.col(grpCol),
          org.apache.spark.sql.functions.col(valueCol), batchId)
        ()
      }
      .start()
  }

  /** Fold one document micro-batch into a persisted boilerplate store
    * ([[graft.operators.Boilerplate.buildStore]] layout) exactly once —
    * the committed-staging protocol around the fold's SIX artifacts:
    * the pair-store delta (bucket partitions), the counts-store delta
    * (bucket partitions), the doc-store append (dbucket partitions),
    * the crossed-lines dictionary append, the `_meta` high-water row,
    * and the batch's CHANGELOG emission
    * (cleaned batch + re-emissions of stored docs a threshold crossing
    * invalidated) accumulated under `outPath` with `seq = batchId` —
    * boilerplate cleaning is RETROACTIVE, so unlike s14's disjoint
    * outputs the accumulated changelog overlaps and readers resolve
    * latest-seq-per-doc. Returns whether the batch was applied. */
  def foldBoilerplateBatchIdempotent(spark: SparkSession, storePath: String,
                                     outPath: String,
                                     batch: org.apache.spark.sql.DataFrame,
                                     batchId: Long, minDocs: Long,
                                     nBuckets: Int,
                                     nDocBuckets: Int): Boolean = {
    import java.nio.file.Paths
    val staging = Paths.get(storePath, s".boiler_staging_$batchId")
    applyBatchIdempotent(
        Paths.get(storePath, s"_boiler_batch_$batchId"), staging) { () =>
      stageBoilerplateFold(spark, storePath, staging, batch, batchId,
        minDocs, nBuckets, nDocBuckets)
    } { () => promoteStagedBoilerplateFold(storePath, outPath, batchId) }
  }

  /** Stage step of [[foldBoilerplateBatchIdempotent]]: compute the fold
    * against the LIVE (not-yet-mutated) store
    * ([[graft.operators.Boilerplate.computeFold]] — reads nothing from
    * the store after it returns) and stage all five artifacts, with a
    * hand-written `_SUCCESS` LAST. Exposed for the spec's crash-window
    * replays. */
  private[graft] def stageBoilerplateFold(spark: SparkSession,
                                          storePath: String,
                                          staging: java.nio.file.Path,
                                          batch: org.apache.spark.sql.DataFrame,
                                          batchId: Long, minDocs: Long,
                                          nBuckets: Int,
                                          nDocBuckets: Int): Unit = {
    // AQE-off clone (StoreCompaction.quietSession): same rationale as
    // the substr twin above
    val qs = graft.operators.StoreCompaction.quietSession(spark)
    graft.operators.Boilerplate.stageFold(qs, storePath, staging,
      org.apache.spark.sql.GraftColumnBridge.onSession(qs, batch),
      "doc_id", "text", minDocs, nBuckets, nDocBuckets,
      seq = batchId)
    ()
  }

  /** Promote step of [[foldBoilerplateBatchIdempotent]]: copy the
    * committed staging into the live sub-stores under DETERMINISTIC
    * `bbatch<id>-<name>` names with REPLACE_EXISTING — a partial-crash
    * re-copy overwrites the same targets byte-identically. Exposed for
    * the spec's crash-window replays. */
  private[graft] def promoteStagedBoilerplateFold(storePath: String,
                                                  outPath: String,
                                                  batchId: Long): Unit =
    graft.operators.Boilerplate.promoteFold(storePath,
      java.nio.file.Paths.get(storePath, s".boiler_staging_$batchId"),
      s"bbatch$batchId", Some(outPath))

  /** Streaming incremental boilerplate ingest (s16): a stream of
    * MONOTONICALLY-ID'd document batches folds into the persisted
    * boilerplate store, each micro-batch emitting a changelog segment
    * (its own cleaned docs + re-emissions of invalidated stored docs)
    * exactly once. Because the common-line predicate is RETROACTIVE,
    * the accumulated output is resolved latest-seq-per-doc — and that
    * resolution equals the full [[graft.operators.Boilerplate.removeCommonLines]]
    * recompute over corpus ∪ batches (c5's oracle). Per batch the
    * pair store is read bucket-pruned and the doc store only for the
    * bounded invalidated-id set — the corpus is never rescanned. */
  def streamingBoilerplateIngest(spark: SparkSession, srcDir: String,
                                 schema: StructType, storePath: String,
                                 outPath: String, checkpoint: String,
                                 minDocs: Long, nBuckets: Int,
                                 nDocBuckets: Int,
                                 maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(nf => reader.option("maxFilesPerTrigger", nf))
    reader.parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        foldBoilerplateBatchIdempotent(spark, storePath, outPath,
          batch.toDF(), batchId, minDocs, nBuckets, nDocBuckets)
        ()
      }
      .start()
  }

  /** Fold one (doc_id, n) token-count micro-batch into a persisted
    * sequence-packing span store
    * ([[graft.operators.Pack.buildSpanStore]] layout) exactly once —
    * the committed-staging protocol around TWO artifacts: the batch's
    * span emission (accumulated under `outPath`; spans are final on
    * emission — the stream only grows at the end, so segments are
    * disjoint and no latest-wins resolution is needed) and the
    * additive `_meta` high-water row. Returns whether the batch was
    * applied. */
  def foldPackBatchIdempotent(spark: SparkSession, storePath: String,
                              outPath: String,
                              batch: org.apache.spark.sql.DataFrame,
                              batchId: Long, seqLen: Long,
                              docsPerShard: Long): Boolean = {
    import java.nio.file.Paths
    val staging = Paths.get(storePath, s".pack_staging_$batchId")
    applyBatchIdempotent(
        Paths.get(storePath, s"_pack_batch_$batchId"), staging) { () =>
      stagePackFold(spark, storePath, staging, batch, seqLen, docsPerShard)
    } { () => promoteStagedPackFold(storePath, outPath, batchId) }
  }

  /** Stage step of [[foldPackBatchIdempotent]] — compute against the
    * LIVE (not-yet-mutated) meta, stage spans + the additive meta
    * row, `_SUCCESS` last. Exposed for the spec's crash-window
    * replays. */
  private[graft] def stagePackFold(spark: SparkSession, storePath: String,
                                   staging: java.nio.file.Path,
                                   batch: org.apache.spark.sql.DataFrame,
                                   seqLen: Long,
                                   docsPerShard: Long): Unit = {
    deleteRecursively(staging)
    val (spans, newMax, delta) = graft.operators.Pack.computeSpanFold(
      spark, storePath, batch, "doc_id", col("n"), seqLen, docsPerShard)
    spans.write.parquet(staging.resolve("out").toString)
    graft.operators.StoreMeta.writeFile(spark,
      staging.resolve("meta").toString,
      graft.operators.Pack.spanMetaFields(newMax, delta, seqLen))
    java.nio.file.Files.createFile(staging.resolve("_SUCCESS"))
  }

  /** Promote step of [[foldPackBatchIdempotent]] — deterministic
    * `pbatch<id>-<name>` names, REPLACE_EXISTING. Exposed for the
    * spec's crash-window replays. */
  private[graft] def promoteStagedPackFold(storePath: String,
                                           outPath: String,
                                           batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    val staging = Paths.get(storePath, s".pack_staging_$batchId")
    require(Files.exists(staging.resolve("_SUCCESS")),
      s"pack staging for batch $batchId is not committed")
    promoteFiles(staging.resolve("out"), Paths.get(outPath),
      s"pbatch$batchId")
    promoteFiles(staging.resolve("meta"),
      Paths.get(s"${storePath}_meta"), s"pbatch$batchId")
  }

  /** Streaming incremental sequence packing (s17): a stream of
    * MONOTONICALLY-ID'd (doc_id, n_tokens) batches extends the global
    * token stream at its high-water mark, each micro-batch emitting
    * its final spans exactly once. The accumulated output ∪-equals a
    * one-shot [[graft.operators.Pack.packSpans]] over corpus ∪
    * batches — q97's oracle — because spans are a pure function of
    * (doc order, counts, seqLen) and emitted segments never change. */
  def streamingPackIngest(spark: SparkSession, srcDir: String,
                          schema: StructType, storePath: String,
                          outPath: String, checkpoint: String,
                          seqLen: Long, docsPerShard: Long,
                          maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(nf => reader.option("maxFilesPerTrigger", nf))
    reader.parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        foldPackBatchIdempotent(spark, storePath, outPath, batch.toDF(),
          batchId, seqLen, docsPerShard)
        ()
      }
      .start()
  }

  /** Streaming incremental IVF ingest (s13): a stream of vector
    * batches grows a persisted, centroid-partitioned IVF index —
    * each micro-batch is assigned against the FROZEN centroid set and
    * appended into the partition layout
    * ([[graft.operators.Similarity.appendToIvfIndex]]); the existing
    * corpus is never re-read, re-assigned, or re-shuffled. This is
    * the s11 move (stream grows persisted state batch by batch)
    * pointed at ANN serving: at 100 TB the index is the big side and
    * ingest cost must be O(batch), which this is. Because centroids
    * are frozen, the stream-grown index is bit-identical to a batch
    * rebuild over corpus ∪ all batches — the s13 gate serves queries
    * from the grown index against e10's full-pipeline oracle. */
  def streamingIvfIngest(spark: SparkSession, srcDir: String,
                         schema: StructType, indexPath: String,
                         centroids: org.apache.spark.sql.DataFrame,
                         checkpoint: String,
                         maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(nf => reader.option("maxFilesPerTrigger", nf))
    reader.parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        appendIvfBatchIdempotent(indexPath, centroids, batch.toDF(), batchId)
        ()
      }
      .start()
  }

  final case class Keyed(id: Long, version: Long, payload: String)

  /** Last-write-wins keyed state — the streaming form of the batch merge
    * (keep-newest-per-key, `/root/reference/sql/load/03_merge.sql:27`).
    * Emits the row only when the incoming version is strictly newer than
    * the stored one (ties keep stored state, like the reference's
    * strict `>`). State is one row per key — at scale, bounded by key
    * cardinality, and evictable via a timeout if keys churn. */
  final case class SessionState(startUs: Long, endUs: Long, n: Long)
  final case class SessionOut(key: Long, start_us: Long, end_us: Long,
                              n_events: Long)

  /** Custom-state streaming sessionization via flatMapGroupsWithState +
    * EventTimeTimeout: per-key session state extends while events
    * arrive within `gapMicros`; a session EMITS either when a
    * same-batch event splits it, or when the WATERMARK passes its
    * end + gap (the timeout path — this is how custom state gets the
    * same bounded-state guarantee `session_window` has natively).
    * Input: a frame with `key` (long) and a WATERMARKED timestamp
    * column `ts` — the watermarked column must flow into the stateful
    * operator itself or the analyzer rejects the event-time timeout. */
  def statefulSessions(events: DataFrame,
                       gapMicros: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    events.select(col("key"), unix_micros(col("ts")).as("us"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rowsIn: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          val rows = rowsIn.map(r => (r._1, r._2))
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(key, s.startUs, s.endUs, s.n))
          } else {
            val sorted = rows.map(_._2).toArray.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { us =>
              cur = cur match {
                case Some(s) if us - s.endUs <= gapMicros =>
                  Some(SessionState(s.startUs, math.max(s.endUs, us), s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(key, s.startUs, s.endUs, s.n)
                  Some(SessionState(us, us, 1))
                case None => Some(SessionState(us, us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire when the event-time watermark passes end + gap
              state.setTimeoutTimestamp((s.endUs + gapMicros) / 1000)
            }
            closed.reverseIterator
          }
      }
  }

  /** Watermark-BOUNDED streaming dedup — the production form of the
    * gate's s3 entry (which keeps exact unbounded `dropDuplicates`
    * state for gate determinism; see SparkEntry s3 notes).
    * `dropDuplicatesWithinWatermark` holds a key in the state store
    * only until the event-time watermark passes its arrival time plus
    * `horizon`, so state is O(keys per horizon) instead of O(every key
    * ever seen) — at 100 TB/day the unbounded form grows without
    * bound, this one plateaus. The trade: a key recurring AFTER the
    * horizon is re-emitted (one duplicate slips through), which is the
    * right contract for ingest dedup where the duplicates that matter
    * are near-in-time (retries, replays) — and exactly why the
    * deterministic gate can't use it (output depends on arrival order
    * relative to the watermark). */
  def dedupWithinWatermark(src: DataFrame, tsCol: String, keys: Seq[String],
                           horizon: String = "10 minutes"): DataFrame =
    src.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keys)

  /** One streaming Misra–Gries summary update: the sketch group's
    * partition id, its non-null-keyed row count so far, and its
    * current ≤ 2k candidate keys (sorted — the array is state, not
    * output, but deterministic encoding keeps sink tables stable for
    * same-order replays). */
  final case class HHUpdate(pgrp: Int, n: Long, keys: Array[String])

  /** Streaming heavy-hitter SKETCH: the q76 Misra–Gries summary
    * maintained incrementally inside `mapGroupsWithState` — the
    * streaming half of the two-pass exact-frequent-items contract
    * ([[graft.operators.HeavyHitters.frequentItems]]).
    *
    * Keys are spread over `nGroups` hash groups; each group's state is
    * one bounded [[graft.operators.HeavyHitters.MGSummary]] (≤ 2k
    * counters + the group's row count), folded forward every
    * micro-batch with the SAME reduce the batch Aggregator uses. A key
    * lives in exactly one hash group, so its undercount is bounded by
    * that group's n_g/(k+1) ≤ n/(k+1) — the merged candidate union
    * therefore contains every key with global count > n/k, the same
    * guarantee the batch sketch gives, regardless of batch boundaries
    * or arrival order (Agarwal et al.'s mergeable-summaries analysis
    * covers arbitrary merge trees, and a stream is just a deep one).
    *
    * Each update emits the group's CURRENT (n, candidates); the
    * finalization (take each group's last update, union candidates,
    * exact-recheck against cold storage with the integer threshold
    * cnt·k > Σn) runs as a batch step — see the s8 entry. The exact
    * recheck makes the final output deterministic even though the
    * in-flight candidate sets vary with arrival order: candidates are
    * a superset of the true heavy hitters in every run, and the exact
    * threshold prunes them to the same set.
    *
    * 100-TB design: state is nGroups × ≤ 2k counters TOTAL — the
    * stream shuffles rows to nGroups state partitions but the STATE
    * STORE never grows with key cardinality (contrast a streaming
    * groupBy(key).count(), whose state is the key space). nGroups
    * spreads the per-row state-update cost; k bounds memory.
    */
  def streamingHeavyHitterSketch(keys: Dataset[String], k: Int,
                                 nGroups: Int): Dataset[HHUpdate] = {
    import keys.sparkSession.implicits._
    val agg = new graft.operators.HeavyHitters.MisraGriesAgg(k)
    keys
      .groupByKey(s => math.floorMod(s.##, nGroups))
      .mapGroupsWithState[graft.operators.HeavyHitters.MGSummary, HHUpdate](
        GroupStateTimeout.NoTimeout) {
        (pgrp: Int, rows: Iterator[String],
         state: GroupState[graft.operators.HeavyHitters.MGSummary]) =>
          val next = rows.foldLeft(state.getOption.getOrElse(agg.zero))(agg.reduce)
          state.update(next)
          HHUpdate(pgrp, next.n, next.counts.keysIterator.toArray.sorted)
      }
  }

  /** Finalize a [[streamingHeavyHitterSketch]] run: `updates` is the
    * update-mode sink table (every emitted [[HHUpdate]]), `keyed` the
    * batch view of the SAME rows the stream consumed (one string
    * column `k`, nulls already excluded). Takes each group's last
    * update (n strictly increases per update, so max-n is unique),
    * unions the candidates, and exact-rechecks with the integer
    * threshold cnt·k > Σn — output (k, cnt) is exactly the batch
    * [[graft.operators.HeavyHitters.frequentItems]] / naive
    * GROUP BY + HAVING set. */
  def finalizeHeavyHitters(updates: DataFrame, keyed: DataFrame,
                           k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("pgrp")).orderBy(col("n").desc)
    val fin = updates.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
    val tot = fin.agg(sum(col("n")).as("_n"))
    val cand = fin.select(explode(col("keys")).as("k")).distinct()
    keyed.join(cand, "k")
      .groupBy("k").agg(count(lit(1)).cast("bigint").as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") * k > col("_n"))
      .select(col("k"), col("cnt"))
  }

  def lastWriteWins(input: Dataset[Keyed]): Dataset[Keyed] = {
    import input.sparkSession.implicits._
    input.groupByKey(_.id)
      .flatMapGroupsWithState[Keyed, Keyed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Keyed], state: GroupState[Keyed]) =>
          val newest = rows.reduceOption((a, b) => if (b.version > a.version) b else a)
          newest match {
            case Some(r) if !state.exists || r.version > state.get.version =>
              state.update(r)
              Iterator.single(r)
            case _ => Iterator.empty
          }
      }
  }
}
