package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Merge

/** Property tests for the merge operator — the invariants the reference
  * enforces via SQL checks and its idempotency protocol
  * (`/root/reference/README.md:210-225`, `sql/load/04_checks.sql`).
  * Uses raw ScalaCheck generators with a fixed seed (the scalatest
  * bridge artifact is not in the offline dependency cache). */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    id <- Gen.chooseNum(0L, 15L)
    v <- Gen.chooseNum(0L, 8L)
    payload <- Gen.alphaStr.map(_.take(4))
  } yield (id, v, payload)

  private val batchGen = Gen.listOfN(12, rowGen)

  private def df(rows: List[(Long, Long, String)]): DataFrame =
    rows.toDF("id", "extracted_at", "v")

  // within-batch ties broken deterministically before merging (the
  // reference dedups each batch before load)
  private def canon(rows: List[(Long, Long, String)]) =
    df(rows).groupBy("id", "extracted_at").agg(
      org.apache.spark.sql.functions.max("v").as("v"))
      .select("id", "extracted_at", "v")

  test("keepLast property: result equals last-by-order row per key (10 random cases)") {
    (0 until 10).foreach { i =>
      val rows = batchGen.apply(Gen.Parameters.default, Seed(7L + i)).get
        .zipWithIndex.map { case ((id, _, p), ord) => (id, ord.toLong, p) }
      val df2 = rows.toDF("id", "ord", "p")
      val got = graft.operators.Dedup.keepLast(df2, Seq("id"),
        org.apache.spark.sql.functions.col("ord"))
        .select("id", "p").as[(Long, String)].collect().toMap
      val expected = rows.groupBy(_._1).map { case (id, rs) =>
        id -> rs.maxBy(_._2)._3
      }
      assert(got == expected, s"case $i")
    }
  }

  test("topK property: at most k rows per group, ranks contiguous from 1 (10 random cases)") {
    (0 until 10).foreach { i =>
      val rows = batchGen.apply(Gen.Parameters.default, Seed(99L + i)).get
      val df2 = rows.toDF("g", "v", "p")
      val k = 1 + i % 3
      val got = graft.operators.TopK.perGroup(df2, Seq("g"),
          Seq(org.apache.spark.sql.functions.col("v").desc,
            org.apache.spark.sql.functions.col("p").asc), k)
        .select("g", "v", "rnk").as[(Long, Long, Int)].collect()
      got.groupBy(_._1).foreach { case (g, rs) =>
        assert(rs.length <= k, s"case $i group $g exceeds k")
        assert(rs.map(_._3).sorted.toSeq == (1 to rs.length), s"case $i ranks")
        // each group's rank-1 value is the group max
        val expectedMax = rows.filter(_._1 == g).map(_._2).max
        assert(rs.find(_._3 == 1).get._2 == expectedMax, s"case $i max")
      }
    }
  }

  test("merge: PK-unique, version-monotone, idempotent on re-merge (15 random cases)") {
    (0 until 15).foreach { i =>
      val seed = Seed(42L + i)
      val t = batchGen.apply(Gen.Parameters.default, seed).get
      val b = batchGen.apply(Gen.Parameters.default, seed.next).get
      val target = canon(t); val batch = canon(b)
      val m = Merge.merged(target, batch, Seq("id"), "extracted_at")
      // PK uniqueness (the reference's dup detector must return 0 rows)
      assert(m.groupBy("id").count().filter($"count" > 1).isEmpty, s"case $i: dup PK")
      // version monotonicity: merged version == max version per key
      val maxv = target.unionByName(batch).groupBy("id")
        .agg(org.apache.spark.sql.functions.max("extracted_at").as("mx"))
      assert(m.join(maxv, "id").filter($"extracted_at" =!= $"mx").isEmpty,
        s"case $i: non-max version survived")
      // idempotency: merging the same batch again changes nothing
      val m2 = Merge.merged(m, batch, Seq("id"), "extracted_at")
      assert(m2.exceptAll(m).isEmpty && m.exceptAll(m2).isEmpty,
        s"case $i: not idempotent")
    }
  }
}
