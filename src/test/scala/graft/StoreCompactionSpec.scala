package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.operators.StoreCompaction

/** Store compaction: the small-files maintenance pass for the
  * persisted serving stores. Pins the three contracts: row identity
  * (compaction regroups files, never rows), real file-count
  * reduction, and crash-convergence of the per-partition atomic swap
  * (the repair protocol finishes or discards a half-done publish). */
class StoreCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def buildStore(nAppends: Int): String = {
    val root = Files.createTempDirectory("cstore").toString + "/store"
    (0 until nAppends).foreach { i =>
      (0L until 100L).map(j => (i * 100L + j, j % 4))
        .toDF("v", "bucket")
        .repartition(2) // several files per partition per append
        .write.mode("append").partitionBy("bucket").parquet(root)
    }
    root
  }

  private def rows(path: String): Set[(Long, Long)] =
    spark.read.parquet(path).select($"v", $"bucket".cast("long"))
      .as[(Long, Long)].collect().toSet

  test("compaction drops file counts, keeps every row, is idempotent") {
    val store = buildStore(4)
    val expect = rows(store)
    val before = StoreCompaction.partitionFileCounts(store)
    assert(before.values.forall(_ >= 4), s"fixture too small: $before")
    val rep = StoreCompaction.compactStore(spark, store)
    assert(rep.partitionsCompacted == 4)
    assert(rep.filesAfter < rep.filesBefore)
    val after = StoreCompaction.partitionFileCounts(store)
    assert(after.values.forall(_ == 1), s"expected 1 file/partition: $after")
    assert(rows(store) === expect, "compaction must not change rows")
    // idempotent: a second run finds nothing at threshold
    val rep2 = StoreCompaction.compactStore(spark, store)
    assert(rep2.partitionsCompacted == 0)
    assert(rows(store) === expect)
  }

  test("appends after compaction land and read normally") {
    val store = buildStore(3)
    StoreCompaction.compactStore(spark, store)
    val expect = rows(store) ++ (1000L until 1010L).map(v => (v, v % 4))
    (1000L until 1010L).map(v => (v, v % 4)).toDF("v", "bucket")
      .write.mode("append").partitionBy("bucket").parquet(store)
    assert(rows(store) === expect)
  }

  test("crash between the two renames converges via repair") {
    val store = buildStore(3)
    val expect = rows(store)
    // simulate: stage a committed compacted replacement for bucket=1,
    // then crash AFTER the partition was moved to trash but BEFORE
    // the staged dir was published — the worst window (partition
    // absent from the root)
    val part = Paths.get(store, "bucket=1")
    val staged = Paths.get(store, ".compact_stage", "bucket=1")
    Files.createDirectories(staged.getParent)
    spark.read.parquet(part.toString)
      .repartition(1).write.mode("overwrite").parquet(staged.toString)
    assert(Files.exists(staged.resolve("_SUCCESS")))
    val trash = Paths.get(store, ".compact_trash", "bucket=1")
    Files.createDirectories(trash.getParent)
    Files.move(part, trash, StandardCopyOption.ATOMIC_MOVE)
    assert(!Files.exists(part), "simulated crash: partition absent")
    // any maintenance entry converges the store (repair runs first)
    StoreCompaction.repairStore(store)
    assert(Files.exists(part), "repair must publish the committed stage")
    assert(!Files.exists(Paths.get(store, ".compact_trash")),
      "superseded trash must be dropped")
    assert(rows(store) === expect, "no row lost or duplicated")
  }

  test("partition stranded in trash with no committed stage is restored") {
    val store = buildStore(3)
    val expect = rows(store)
    // crash window: the live partition was renamed into trash but the
    // staged replacement is UNCOMMITTED (no _SUCCESS) — the trashed
    // copy is the only live data. Repair must restore it, not delete.
    val part = Paths.get(store, "bucket=3")
    val staged = Paths.get(store, ".compact_stage", "bucket=3")
    Files.createDirectories(staged)
    Files.write(staged.resolve("part-junk.parquet"), Array[Byte](7, 7))
    val trash = Paths.get(store, ".compact_trash", "bucket=3")
    Files.createDirectories(trash.getParent)
    Files.move(part, trash, StandardCopyOption.ATOMIC_MOVE)
    assert(!Files.exists(part), "simulated crash: partition absent")
    StoreCompaction.repairStore(store)
    assert(Files.exists(part), "repair must restore the trashed original")
    assert(!Files.exists(Paths.get(store, ".compact_trash")))
    assert(!Files.exists(Paths.get(store, ".compact_stage")))
    assert(rows(store) === expect, "no row lost or duplicated")
  }

  test("compaction refuses the swap when success markers are disabled") {
    val store = buildStore(3)
    val expect = rows(store)
    val hc = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val prev = hc.get(key)
    hc.set(key, "false")
    try {
      val e = intercept[IllegalArgumentException] {
        StoreCompaction.compactStore(spark, store)
      }
      assert(e.getMessage.contains("_SUCCESS"))
    } finally {
      if (prev == null) hc.unset(key) else hc.set(key, prev)
    }
    // the live store was never touched; repair converges the aborted
    // stage away and every row is still served
    StoreCompaction.repairStore(store)
    assert(rows(store) === expect)
    assert(!Files.exists(Paths.get(store, ".compact_stage")))
  }

  test("uncommitted staging is discarded, intact partition kept") {
    val store = buildStore(3)
    val expect = rows(store)
    // crash mid-stage: staged dir WITHOUT _SUCCESS, partition intact
    val staged = Paths.get(store, ".compact_stage", "bucket=2")
    Files.createDirectories(staged)
    Files.write(staged.resolve("part-junk.parquet"), Array[Byte](9, 9))
    StoreCompaction.repairStore(store)
    assert(!Files.exists(staged), "uncommitted stage must be discarded")
    assert(rows(store) === expect)
  }
}
