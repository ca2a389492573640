package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Merge}

class MergeDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(rows: Seq[(Long, String, Long)]): DataFrame =
    rows.toDF("id", "v", "extracted_at")

  test("keepLast keeps positionally-last duplicate") {
    val df = Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "x", 1L))
      .toDF("id", "v", "ord")
    val got = Dedup.keepLast(df, Seq("id"), $"ord")
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "b", 2L -> "x"))
  }

  test("merge: insert-if-absent, update-if-newer, equal-version keeps target") {
    val target = tbl(Seq((1L, "t1", 10L), (2L, "t2", 10L), (3L, "t3", 10L)))
    val batch = tbl(Seq(
      (2L, "newer", 11L),   // strictly newer -> update
      (3L, "equal", 10L),   // equal version  -> target wins
      (4L, "new", 5L)))     // absent         -> insert
    val r = Merge.merge(target, batch, Seq("id"), "extracted_at")
    val got = r.merged.select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "t1", 2L -> "newer", 3L -> "t3", 4L -> "new"))
    assert(r.inserted == 1 && r.updated == 1)
  }

  test("merge idempotency: re-merging the same batch changes nothing") {
    val target = tbl(Seq((1L, "t1", 10L)))
    val batch = tbl(Seq((1L, "b1", 11L), (2L, "b2", 3L)))
    val once = Merge.merged(target, batch, Seq("id"), "extracted_at")
    val twice = Merge.merged(once, batch, Seq("id"), "extracted_at")
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
    val r2 = Merge.merge(once, batch, Seq("id"), "extracted_at")
    assert(r2.inserted == 0 && r2.updated == 0)
  }

  test("batch with duplicate keys: counts reflect distinct keys, result deterministic") {
    val target = tbl(Seq((9L, "t", 1L)))
    // id 7 twice at the SAME version with different payloads, plus a
    // third older row — the canonical batch must collapse them
    val batch = tbl(Seq((7L, "pA", 5L), (7L, "pB", 5L), (7L, "old", 3L)))
    val r = Merge.merge(target, batch, Seq("id"), "extracted_at")
    assert(r.inserted == 1 && r.updated == 0) // one distinct new key
    val merged = r.merged.filter($"id" === 7L).collect()
    assert(merged.length == 1 && merged.head.getLong(2) == 5L)
    // deterministic winner across plans: re-merge picks the same payload
    val again = Merge.merge(target, batch, Seq("id"), "extracted_at")
    assert(again.merged.filter($"id" === 7L).head().getString(1) ==
      merged.head.getString(1))
  }

  test("merge result has unique keys (PK invariant)") {
    val target = tbl(Seq((1L, "a", 1L), (2L, "b", 2L)))
    val batch = tbl(Seq((1L, "c", 9L), (1L, "d", 8L), (3L, "e", 1L)))
    val m = Merge.merged(target, batch, Seq("id"), "extracted_at")
    assert(m.groupBy("id").count().filter($"count" > 1).isEmpty)
    // newest batch row (9L) must win within the batch too
    assert(m.filter($"id" === 1L).select("v").as[String].head() == "c")
  }
}
