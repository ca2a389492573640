package graft

import org.apache.spark.sql.functions._
import graft.operators.SnapshotDiff

/** Snapshot diff / CDC derivation (q77). Reference oracle inside the
  * spec is the naive full-outer-join-on-values plan; the digest-first
  * operator must match it exactly, including NULL payload edges
  * (to_json keeps NULL distinct from every string). */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, Option("alpha"), 10L),   // unchanged
    (2L, Option("beta"), 20L),    // payload update
    (3L, Option("gamma"), 30L),   // delete
    (4L, None: Option[String], 40L), // null -> value update
    (5L, Option("eps"), 50L)      // value -> null update
  ).toDF("id", "txt", "v")

  private def newSnap = Seq(
    (1L, Option("alpha"), 10L),
    (2L, Option("beta2"), 20L),
    (4L, Option("delta"), 40L),
    (5L, None: Option[String], 50L),
    (6L, Option("zeta"), 60L)     // insert
  ).toDF("id", "txt", "v")

  test("classifies insert, update (incl. null transitions), delete; drops unchanged") {
    val got = SnapshotDiff.diff(oldSnap, newSnap, Seq("id"))
      .as[(Long, Option[String], Long, String)].collect().toSet
    assert(got === Set(
      (2L, Some("beta2"), 20L, "update"),
      (3L, Some("gamma"), 30L, "delete"),
      (4L, Some("delta"), 40L, "update"),
      (5L, None, 50L, "update"),
      (6L, Some("zeta"), 60L, "insert")))
  }

  test("matches the naive value-compare full outer join on a wider fixture") {
    val o = (0L until 500L).map(i => (i, s"t$i", i % 7)).toDF("id", "txt", "v")
    val n = (0L until 520L).filter(_ % 11 != 3)
      .map(i => (i, if (i % 5 == 0) s"t$i!" else s"t$i", i % 7)).toDF("id", "txt", "v")
    val got = SnapshotDiff.diff(o, n, Seq("id"))
      .select("id", "op").as[(Long, String)].collect().toSet
    val naive = o.as("o").join(n.as("n"), col("o.id") === col("n.id"), "full_outer")
      .withColumn("op",
        when(col("o.id").isNull, "insert")
          .when(col("n.id").isNull, "delete")
          .when(!(col("o.txt") <=> col("n.txt")) || !(col("o.v") <=> col("n.v")), "update"))
      .filter(col("op").isNotNull)
      .select(coalesce(col("o.id"), col("n.id")).as("id"), col("op"))
      .as[(Long, String)].collect().toSet
    assert(got === naive)
    assert(got.exists(_._2 == "insert") && got.exists(_._2 == "delete") &&
      got.exists(_._2 == "update"))
  }

  test("multi-column keys and partitioning invariance") {
    val o = (0 until 300).map(i => (i % 10, s"p${i / 10}", s"val$i")).toDF("a", "b", "x")
    val n = (0 until 300).filter(_ % 13 != 0)
      .map(i => (i % 10, s"p${i / 10}", if (i % 17 == 0) s"VAL$i" else s"val$i"))
      .toDF("a", "b", "x")
    val one = SnapshotDiff.diff(o.repartition(1), n.repartition(1), Seq("a", "b"))
      .as[(Int, String, String, String)].collect().toSet
    val many = SnapshotDiff.diff(o.repartition(13), n.repartition(7), Seq("a", "b"))
      .as[(Int, String, String, String)].collect().toSet
    assert(one === many)
    assert(one.nonEmpty)
  }

  test("schema mismatch is rejected") {
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(oldSnap, newSnap.drop("v"), Seq("id"))
    }
  }

  // Partitioned fixture: 16 partitions, mutations confined to p ∈
  // {3 (deletes), 7 (inserts), 11 (updates)}; the other 13 must be
  // signature-identical and short-circuit.
  private def partOld = (0L until 800L)
    .filter(i => !(i % 16 == 7 && i % 3 == 0))
    .map(i => (i, i % 16, s"t$i")).toDF("id", "p", "txt")
  private def partNew = (0L until 800L)
    .filter(i => !(i % 16 == 3 && i % 5 == 0))
    .map(i => (i, i % 16, if (i % 16 == 11 && i % 3 == 0) s"t$i!" else s"t$i"))
    .toDF("id", "p", "txt")

  test("partition short-circuit: changed set is exactly the mutated partitions") {
    val changed = SnapshotDiff.changedPartitions(partOld, partNew, Seq("p"))
      .as[Long].collect().toSet
    assert(changed === Set(3L, 7L, 11L))
  }

  test("diffPartitioned equals the full diff") {
    val full = SnapshotDiff.diff(partOld, partNew, Seq("id"))
      .as[(Long, Long, String, String)].collect().toSet
    val pruned = SnapshotDiff.diffPartitioned(partOld, partNew,
        Seq("id"), Seq("p"))
      .as[(Long, Long, String, String)].collect().toSet
    assert(pruned === full)
    assert(full.exists(_._4 == "insert") && full.exists(_._4 == "delete") &&
      full.exists(_._4 == "update"))
  }

  test("rows moving between partitions flag both partitions") {
    val o = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("id", "p", "txt")
    val n = Seq((1L, 20L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("id", "p", "txt") // id 1 moved p 10 -> 20
    val changed = SnapshotDiff.changedPartitions(o, n, Seq("p"))
      .as[Long].collect().toSet
    assert(changed === Set(10L, 20L))
    val got = SnapshotDiff.diffPartitioned(o, n, Seq("id"), Seq("p"))
      .as[(Long, Long, String, String)].collect().toSet
    assert(got === Set((1L, 20L, "a", "update")))
  }

  test("applyChanges roundtrip: apply(old, diff(old, new)) == new") {
    val changes = SnapshotDiff.diff(oldSnap, newSnap, Seq("id"))
    val got = SnapshotDiff.applyChanges(oldSnap, changes, Seq("id"))
      .as[(Long, Option[String], Long)].collect().toSet
    val want = newSnap.as[(Long, Option[String], Long)].collect().toSet
    assert(got === want)
    // batched apply (keys split across batches) commutes to the same
    // final state — the s9 stream's determinism argument
    val b0 = changes.filter(col("id") % 2 === 0)
    val b1 = changes.filter(col("id") % 2 === 1)
    val viaB01 = SnapshotDiff.applyChanges(
      SnapshotDiff.applyChanges(oldSnap, b0, Seq("id")), b1, Seq("id"))
      .as[(Long, Option[String], Long)].collect().toSet
    val viaB10 = SnapshotDiff.applyChanges(
      SnapshotDiff.applyChanges(oldSnap, b1, Seq("id")), b0, Seq("id"))
      .as[(Long, Option[String], Long)].collect().toSet
    assert(viaB01 === want && viaB10 === want)
  }

  test("applyChanges roundtrip on the wider fixture, multi-column keys") {
    val o = (0 until 300).map(i => (i % 10, s"p${i / 10}", s"val$i")).toDF("a", "b", "x")
    val n = (0 until 300).filter(_ % 13 != 0)
      .map(i => (i % 10, s"p${i / 10}", if (i % 17 == 0) s"VAL$i" else s"val$i"))
      .toDF("a", "b", "x")
    val got = SnapshotDiff.applyChanges(o,
        SnapshotDiff.diff(o, n, Seq("a", "b")), Seq("a", "b"))
      .as[(Int, String, String)].collect().toSet
    assert(got === n.as[(Int, String, String)].collect().toSet)
  }

  test("NULL partition values are matchable (skip when unchanged, diff when changed)") {
    val o = Seq((1L, Option(1L), "a"), (2L, None: Option[Long], "b"),
      (3L, None: Option[Long], "c")).toDF("id", "p", "txt")
    val same = Seq((1L, Option(1L), "a"), (2L, None: Option[Long], "b"),
      (3L, None: Option[Long], "c")).toDF("id", "p", "txt")
    assert(SnapshotDiff.changedPartitions(o, same, Seq("p")).isEmpty)
    val mut = Seq((1L, Option(1L), "a"), (2L, None: Option[Long], "B"),
      (3L, None: Option[Long], "c")).toDF("id", "p", "txt")
    assert(SnapshotDiff.changedPartitions(o, mut, Seq("p"))
      .as[Option[Long]].collect().toSet === Set(None))
    val got = SnapshotDiff.diffPartitioned(o, mut, Seq("id"), Seq("p"))
      .as[(Long, Option[Long], String, String)].collect().toSet
    assert(got === Set((2L, None, "B", "update")))
  }
}
