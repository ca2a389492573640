package graft.operators

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Filesystem primitives shared by every persisted-store maintenance
  * and ingest family (substr d26, quantile q96, boilerplate c5, IVF
  * s13, and their streaming twins) — factored once so the
  * committed-staging exactly-once protocol and its promote/sweep
  * moves have a single tested implementation instead of one copy per
  * store family. */
object StoreFiles {

  /** `Files.list` with the mandated close (its javadoc requires it;
    * an unclosed stream leaks a directory fd until GC). */
  def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }

  /** Copy every `*.parquet` under `srcDir` into `dstDir` under the
    * deterministic name `<stamp>-<file>` with REPLACE_EXISTING — the
    * promote step's shared file move: a partial-crash re-copy
    * overwrites the same targets byte-identically. */
  def promoteFiles(srcDir: Path, dstDir: Path, stamp: String): Unit = {
    Files.createDirectories(dstDir)
    listDir(srcDir)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach { f =>
        Files.copy(f, dstDir.resolve(s"$stamp-${f.getFileName.toString}"),
          StandardCopyOption.REPLACE_EXISTING)
      }
  }

  /** The committed-staging exactly-once protocol. Parquet append has
    * no natural idempotency and a bare marker-after-append leaves a
    * window (append committed, marker not yet) where a replayed
    * batch double-appends; this closes every window:
    *
    *  1. `marker` exists → already applied, skip (sweep leaked
    *     staging).
    *  2. `staging/_SUCCESS` absent → crashed attempt: `stage` must
    *     rebuild the staging from the LIVE (not-yet-mutated) state
    *     and write `_SUCCESS` LAST — its presence freezes the
    *     staging, so a replay after a half-promote reuses it verbatim
    *     and never recomputes against mutated state.
    *  3. `promote` copies staged files to their live destinations
    *     under DETERMINISTIC batch-stamped names with
    *     REPLACE_EXISTING — a partial-crash re-copy overwrites the
    *     same targets byte-identically.
    *  4. Marker (the commit point), then sweep staging.
    *
    * Returns whether the batch was applied (false = replay skip). */
  def applyBatchIdempotent(marker: Path, staging: Path)(
      stage: () => Unit)(promote: () => Unit): Boolean = {
    if (Files.exists(marker)) {
      if (Files.exists(staging)) deleteRecursively(staging)
      false
    } else {
      if (!Files.exists(staging.resolve("_SUCCESS"))) stage()
      promote()
      Files.createFile(marker)
      deleteRecursively(staging)
      true
    }
  }
}
