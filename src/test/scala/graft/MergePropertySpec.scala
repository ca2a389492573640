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
