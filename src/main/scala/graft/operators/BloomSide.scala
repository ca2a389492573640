package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-bucket Bloom sidecars for bucket-partitioned key stores — the
  * r16 cost model pinned the incremental ExactSubstr fold's floor at
  * the store KEY scan: window keys are uniform digests, so parquet
  * min/max pruning never bites, and bucket pruning by the batch's own
  * bucket set stops biting once the batch carries more distinct keys
  * than there are buckets (a 10 k-doc batch covers all 64). The
  * sidecar closes the STEADY-STATE shape (small batch, big store): a
  * per-(bucket, fold) Bloom over the delta's key hashes lets a fold
  * skip every bucket in which NONE of its keys can exist — the bucket
  * is read only on a maybe-hit, so false positives cost a redundant
  * scan, never correctness.
  *
  * Layout: `<store>/_bloomside/bucket=<b>/…` rows
  * `(items LONG, bloom BINARY)` — one row per (bucket, writer pass).
  * The leading underscore keeps the sidecar invisible to Spark's file
  * index, the store's own listings, and the delta-count maintenance
  * trigger. `items = -1` marks a bucket whose key count exceeded the
  * builder's memory cap: readers treat it as always-hit (unprunable),
  * never as absent.
  *
  * Coverage contract (what makes a skip sound): every key in a
  * bucket's store files is covered by some bloom row in that bucket's
  * sidecar dir. Maintainers uphold it by construction — the build
  * writes one pass over the full store, every subsequent fold appends
  * a row per touched bucket (riding the fold's existing concurrent
  * fan-out), and the vacuum REBUILDS the sidecar from the collapsed
  * store under an atomic two-rename swap whose only crash residue is
  * an ABSENT sidecar. Readers are conservative at every hole: store
  * without a `_bloomside` dir → no pruning; bucket dir missing or
  * empty → that bucket is scanned; sidecar bytes over the read cap →
  * no pruning. A crashed fold can leave delta files without their
  * bloom row — the same uncommitted-delta window the store's
  * single-maintainer crash-redo contract already mandates replaying
  * before any further fold or serve, so a committed store never has
  * uncovered keys.
  *
  * 100 TB: bloom bytes ≈ 1.2 B/key (fpp 0.01) — ~80× less than the
  * 16-byte digest column the fold would otherwise scan; the driver
  * reads only the BATCH's buckets' rows under an explicit byte cap,
  * and per-row build memory is bounded by [[MaxItemsPerBloom]]. */
object BloomSide {
  val DirName = "_bloomside"
  val Fpp = 0.01
  /** Per-bloom-row key cap: bounds the builder task's hash buffer
    * (8 B × cap). A bucket beyond it emits the `items = -1` sentinel
    * (correct, just unprunable) — at that size the store wants more
    * buckets, not bigger blooms. */
  val MaxItemsPerBloom = 4 * 1024 * 1024

  private def bloomOf(hashes: Array[Long]): Array[Byte] = {
    val bf = org.apache.spark.util.sketch.BloomFilter
      .create(math.max(hashes.length, 16).toLong, Fpp)
    hashes.foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** One bloom row per bucket over `xxhash64(key)` — 64-bit key
    * hashing in front of the bloom is collision-safe for PRUNING (a
    * collision can only add a false hit). Buffers one bucket's hashes
    * per task, capped by [[MaxItemsPerBloom]]. */
  private def bloomRows(keyed: DataFrame, bucketCol: String,
                        keyCol: String): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed.select(col(bucketCol).cast("long"), xxhash64(col(keyCol)))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (b, it) =>
        val buf = new scala.collection.mutable.ArrayBuffer[Long](1024)
        var over = false
        while (it.hasNext) {
          val h = it.next()._2
          if (!over) {
            buf += h
            if (buf.length > MaxItemsPerBloom) { over = true; buf.clear() }
          }
        }
        if (over) (b, -1L, Array.emptyByteArray)
        else (b, buf.length.toLong, bloomOf(buf.toArray))
      }
      .toDF("bucket", "items", "bloom")
  }

  private def root(path: String): java.nio.file.Path =
    java.nio.file.Paths.get(path, DirName)

  /** Whether `path` maintains a bloom sidecar (listing-only). Folds
    * key their append on this so a store built without the sidecar
    * never gains partial coverage. */
  def maintained(path: String): Boolean =
    java.nio.file.Files.isDirectory(root(path))

  /** Append one bloom row per bucket of `keyed` (a fold's delta,
    * already bucket-clustered — one small job the fold runs
    * concurrently with its delta append). */
  def appendDelta(keyed: DataFrame, path: String, bucketCol: String,
                  keyCol: String): Unit =
    bloomRows(keyed, bucketCol, keyCol)
      .write.mode("append").partitionBy("bucket")
      .parquet(root(path).toString)

  /** Stage one fold's bloom rows under an arbitrary dir (the live
    * sidecar's layout) WITHOUT touching the store — the streaming
    * twin's committed-staging step. [[promoteStaged]] copies a
    * committed staging into the live sidecar. */
  def stageDelta(keyed: DataFrame, stagedDir: String, bucketCol: String,
                 keyCol: String): Unit =
    bloomRows(keyed, bucketCol, keyCol)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(stagedDir)

  /** Promote a staged bloom-delta dir ([[stageDelta]] output) into
    * `path`'s live sidecar under deterministic `<stamp>-` names with
    * REPLACE_EXISTING — a partial-crash re-copy overwrites the same
    * targets byte-identically, so the caller's replay protocol makes
    * the append exactly-once. No-op when the staging has no bloom dir
    * (a store that wasn't bloom-maintained when staged). */
  def promoteStaged(stagedDir: java.nio.file.Path, path: String,
                    stamp: String): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    if (!Files.isDirectory(stagedDir)) return
    val s = Files.list(stagedDir)
    val parts = try s.iterator().asScala.toList finally s.close()
    parts.filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("bucket="))
      .foreach { bdir =>
        StoreFiles.promoteFiles(bdir,
          root(path).resolve(bdir.getFileName.toString), stamp)
      }
  }

  /** Seed a FRESH sidecar from an in-memory keyed frame (the build's
    * checkpointed aggregation) — no store read-back, so the caller
    * can run it concurrently with the store write itself. Only for
    * freshly-(re)built stores: it overwrites the sidecar without the
    * staged swap [[rebuildFromStore]] gives a LIVE store. */
  def seedFresh(keyed: DataFrame, path: String, bucketCol: String,
                keyCol: String): Unit =
    bloomRows(keyed, bucketCol, keyCol)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(root(path).toString)

  /** (Re)build the sidecar from the live store's keys and swap it in
    * atomically: stage to `_bloomside.staged`, two renames. Crash
    * residue is at worst an absent sidecar (readers stop pruning
    * until the next rebuild) — never stale coverage. */
  def rebuildFromStore(spark: SparkSession, path: String,
                       bucketCol: String, keyCol: String): Unit = {
    import java.nio.file.{Files, Paths}
    val live = root(path)
    val staged = Paths.get(path, s"$DirName.staged")
    val trash = Paths.get(path, s"$DirName.trash")
    StoreFiles.deleteRecursively(staged)
    StoreFiles.deleteRecursively(trash)
    bloomRows(
        spark.read.parquet(path).select(col(bucketCol), col(keyCol)),
        bucketCol, keyCol)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(staged.toString)
    if (Files.isDirectory(live)) Files.move(live, trash)
    Files.move(staged, live)
    StoreFiles.deleteRecursively(trash)
  }

  /** Driver-side prune: the subset of `buckets` that might contain
    * any of the caller's key hashes (`hashesByBucket`, batch-bounded
    * by the fold's broadcast contract). Conservative everywhere — a
    * bucket survives unless its sidecar dir exists, every row is a
    * real bloom, and every batch hash for it misses every row. The
    * listing-only `maxBytes` cap bounds what the driver will read
    * (over it → no pruning, no read). The read is DRIVER-DIRECT
    * parquet-mr, not a Spark job: the whole prune costs zero fixed
    * job latencies, so attempting it can never make a fold slower
    * than the unpruned scan it replaces. */
  def pruneBuckets(spark: SparkSession, path: String, buckets: Seq[Long],
                   hashesByBucket: Map[Long, Array[Long]],
                   maxBytes: Long = 64L << 20): Seq[Long] = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val r = root(path)
    if (!Files.isDirectory(r)) return buckets
    val dirs = buckets.map(b => b -> r.resolve(s"bucket=$b"))
      .filter { case (_, d) => Files.isDirectory(d) }
    if (dirs.isEmpty) return buckets
    val files = dirs.map { case (b, d) =>
      val s = Files.list(d)
      try b -> s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }.toList
      finally s.close()
    }
    val bytes = files.iterator.flatMap(_._2).map(p =>
      try Files.size(p) catch { case _: Throwable => 0L }).sum
    if (bytes > maxBytes) return buckets
    // (items, bloom) rows per bucket, read driver-direct. Reader
    // setup dominates (tens of ms per file open), so the per-file
    // reads fan out on a small pool and land in a memo cache —
    // parquet files are immutable (appends add files, the vacuum
    // swaps whole dirs), so repeated folds against the same store
    // pay the read once.
    val distinctFiles = files.flatMap(_._2).distinct
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, distinctFiles.size)))
    val read: Map[java.nio.file.Path, Option[Seq[(Long, Array[Byte])]]] =
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(distinctFiles.map(p =>
            scala.concurrent.Future(p -> cachedBloomRows(p)))),
          scala.concurrent.duration.Duration.Inf).toMap
      } finally pool.shutdown()
    // A bucket is prunable only when EVERY one of its sidecar files
    // read cleanly: a failed file may hold the only coverage for some
    // stored keys, so partial rows must not license a skip.
    val byBucket: Map[Long, Option[Seq[(Long, Array[Byte])]]] =
      files.map { case (b, fs) =>
        val perFile = fs.map(read.getOrElse(_, None))
        b -> (if (perFile.exists(_.isEmpty)) None
              else Some(perFile.flatMap(_.get)))
      }.toMap
    buckets.filter { b =>
      byBucket.get(b) match {
        case None | Some(None) => true // missing or any unreadable file: scan it
        case Some(Some(Nil))   => true // no rows at all: scan it
        case Some(Some(rs)) =>
          val hs = hashesByBucket.getOrElse(b, Array.emptyLongArray)
          rs.exists { case (items, bloomBytes) =>
            items < 0 || {
              val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
                new java.io.ByteArrayInputStream(bloomBytes))
              hs.exists(bf.mightContainLong)
            }
          }
      }
    }
  }

  /** Memo cache over [[readBloomRows]], keyed by (path, size) —
    * sound because sidecar parquet files are immutable. FAILED reads
    * are never cached (the hole would persist across folds); only
    * clean row sets memoize. Bounded crudely: past [[CacheMaxBytes]]
    * of bloom payload the whole map clears (the next fold re-reads;
    * correctness is unaffected). */
  private val CacheMaxBytes = 256L << 20
  private val cacheBytes = new java.util.concurrent.atomic.AtomicLong()
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), Seq[(Long, Array[Byte])]]()
  private def cachedBloomRows(p: java.nio.file.Path): Option[Seq[(Long, Array[Byte])]] = {
    val size = try java.nio.file.Files.size(p) catch { case _: Throwable => -1L }
    if (size < 0) return readBloomRows(p)
    val key = (p.toString, size)
    val hit = cache.get(key)
    if (hit != null) return Some(hit)
    val rows = readBloomRows(p)
    rows.foreach { rs =>
      if (cacheBytes.addAndGet(size) > CacheMaxBytes) {
        cache.clear(); cacheBytes.set(size)
      }
      cache.put(key, rs)
    }
    rows
  }

  /** Read one sidecar file's (items, bloom) rows with parquet-mr on
    * the calling thread. Any read failure → None, distinct from a
    * clean zero-row file (callers must treat None as "this file's
    * coverage is unknown" and keep its bucket unprunable). */
  private def readBloomRows(p: java.nio.file.Path): Option[Seq[(Long, Array[Byte])]] =
    try {
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
          new org.apache.hadoop.fs.Path(p.toString))
        .build()
      try {
        val out = scala.collection.mutable.ListBuffer.empty[(Long, Array[Byte])]
        var g = reader.read()
        while (g != null) {
          val items = g.getLong("items", 0)
          val bloom =
            if (items < 0) Array.emptyByteArray
            else g.getBinary("bloom", 0).getBytes
          out += ((items, bloom))
          g = reader.read()
        }
        Some(out.toList)
      } finally reader.close()
    } catch { case _: Throwable => None }
}
