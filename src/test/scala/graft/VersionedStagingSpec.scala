package graft

import java.nio.file.{Files, Paths}
import graft.operators.VersionedStaging

class VersionedStagingSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(Long, Long, String)]): Unit =
    rows.toDF("id", "version", "v").write.mode("overwrite").parquet(dir)

  test("partial version dirs (no _SUCCESS) are never merge targets") {
    val root = Files.createTempDirectory("vs1").toString
    write(s"$root/v000001", Seq((1L, 1L, "a")))
    // simulate a crash mid-write of v2: parquet present, _SUCCESS gone
    write(s"$root/v000002", Seq((9L, 9L, "garbage")))
    Files.delete(Paths.get(s"$root/v000002/_SUCCESS"))
    assert(VersionedStaging.latestComplete(spark, root).get.endsWith("v000001"))
    val Some((dest, _)) = VersionedStaging.mergeInto(spark, root,
      Seq((2L, 2L, "b")).toDF("id", "version", "v"), Seq("id"), "version")
    // next version overwrites the partial dir; result = v1 data + batch
    assert(dest.endsWith("v000002"))
    val got = spark.read.parquet(dest).select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("replayed batch id is skipped, not duplicated") {
    val root = Files.createTempDirectory("vs2").toString
    val batch = Seq((1L, 1L, "a")).toDF("id", "version", "v")
    val first = VersionedStaging.mergeInto(spark, root, batch,
      Seq("id"), "version", batchId = Some(7L))
    assert(first.isDefined)
    val replay = VersionedStaging.mergeInto(spark, root, batch,
      Seq("id"), "version", batchId = Some(7L))
    assert(replay.isEmpty)
    // a NEW batch id still advances the version
    val next = VersionedStaging.mergeInto(spark, root, batch,
      Seq("id"), "version", batchId = Some(8L))
    assert(next.exists(_._1.endsWith("v000002")))
  }

  test("vacuum keeps the newest versions, removes old ones and orphaned tmp dirs") {
    val root = Files.createTempDirectory("vs_vac").toString
    (1 to 4).foreach { i =>
      VersionedStaging.mergeInto(spark, root,
        Seq((i.toLong, i.toLong, s"v$i")).toDF("id", "version", "v"),
        Seq("id"), "version")
    }
    // orphaned tmp from a writer that crashed between write and rename
    write(s"$root/.tmp-v000002", Seq((9L, 9L, "orphan")))
    val deleted = VersionedStaging.vacuum(spark, root, keep = 2)
    assert(deleted.exists(_.endsWith("v000001")) &&
      deleted.exists(_.endsWith("v000002")) &&
      deleted.exists(_.endsWith(".tmp-v000002")))
    assert(VersionedStaging.latestComplete(spark, root).get.endsWith("v000004"))
    // the kept history still reads fine and holds the merged state
    val got = spark.read.parquet(s"$root/v000004")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L))
    // newest is never deletable even with keep = 1 applied twice
    VersionedStaging.vacuum(spark, root, keep = 1)
    assert(VersionedStaging.latestComplete(spark, root).isDefined)
  }

  test("compact publishes a single-file next version with identical rows") {
    val root = Files.createTempDirectory("vs_cmp").toString
    (1 to 3).foreach { i =>
      VersionedStaging.mergeInto(spark, root,
        Seq((i.toLong, i.toLong, s"v$i")).toDF("id", "version", "v"),
        Seq("id"), "version")
    }
    val before = spark.read.parquet(
      VersionedStaging.latestComplete(spark, root).get)
    val Some(dest) = VersionedStaging.compact(spark, root, numPartitions = 1)
    assert(dest.endsWith("v000004"))
    val after = spark.read.parquet(dest)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
    val parts = new java.io.File(dest).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts == 1)
  }

  test("version ordering is numeric beyond the zero-padding range") {
    val root = Files.createTempDirectory("vs3").toString
    write(s"$root/v999999", Seq((1L, 1L, "a")))
    write(s"$root/v1000000", Seq((2L, 2L, "b")))
    assert(VersionedStaging.latestComplete(spark, root).get.endsWith("v1000000"))
  }
}
