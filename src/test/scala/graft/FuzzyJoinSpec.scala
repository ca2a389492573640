package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** PassJoin-style edit-distance self-join (q78). Every test compares
  * against the naive crossJoin + levenshtein plan — a blocking false
  * negative (a missed pair) breaks set equality, which is the failure
  * mode segment blocking must never have. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: DataFrame, d: Int): Set[(Long, Long, Int)] = {
    val a = df.select(col("id").as("id_a"), col("s").as("sa"))
    val b = df.select(col("id").as("id_b"), col("s").as("sb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")).cast("int"))
      .filter(col("dist") <= d)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
  }

  private def fast(df: DataFrame, d: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.editDistancePairs(df, "id", "s", d)
      .as[(Long, Long, Int)].collect().toSet

  test("hand fixture: substitutions, insertions, deletions at the threshold") {
    val df = Seq(
      (1L, "kitten"), (2L, "sitten"),   // dist 1 (substitution)
      (3L, "sittin"),                   // 2<->3 dist 1, 1<->3 dist 2
      (4L, "kittens"),                  // 1<->4 dist 1 (insertion)
      (5L, "itten"),                    // 1<->5 dist 1 (deletion)
      (6L, "wholly different"), (7L, "kitten")
    ).toDF("id", "s")
    val got = fast(df, 2)
    assert(got === naive(df, 2))
    assert(got.contains((1L, 2L, 1)) && got.contains((1L, 4L, 1)) &&
      got.contains((1L, 5L, 1)) && got.contains((1L, 7L, 0)) &&
      got.contains((1L, 3L, 2)))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("matches brute force on a 300-string corpus with planted typos, d=1..3") {
    // Deterministic strings over a small alphabet with planted edits:
    // every id%3==1 mutates id-1's string (substitute), id%3==2
    // appends a char to id-2's. Lengths vary so segment layouts and
    // the +-d length window all get exercised.
    val strs = (0L until 300L).map { i =>
      val base = (0 until (6 + (i / 3 % 9)).toInt)
        .map(j => ('a' + ((i / 3 * 7 + j * j) % 5)).toChar).mkString
      i % 3 match {
        case 0 => (i, base)
        case 1 => (i, "q" + base.drop(1))
        case _ => (i, base + "x")
      }
    }
    val df = strs.toDF("id", "s").repartition(7)
    for (d <- 1 to 3) {
      val got = fast(df, d)
      assert(got === naive(df, d), s"mismatch at d=$d")
      assert(got.nonEmpty)
    }
  }

  test("short and empty strings: segments degenerate but pairs stay exact") {
    val df = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "b"), (5L, ""),
      (6L, "abcd")).toDF("id", "s")
    for (d <- 1 to 2) assert(fast(df, d) === naive(df, d), s"d=$d")
  }

  test("long strings (~1k chars): bounded verify stays exact") {
    // The regime the 3-arg bounded levenshtein exists for: candidates
    // whose unbounded DP is O(|s|²) on ~1k-char strings. Planted
    // structure: 8 base documents, each with a dist-1 substitution
    // twin and an exact dist-2 twin (two substitutions to 'z', a char
    // outside the alphabet), plus one unrelated long string per base
    // that blocking must not pair. (The naive oracle here pays the
    // full unbounded DP per pair — which is exactly why the string
    // length is capped at 1k in this spec.)
    val mk = (seed: Long) => (0 until 1000)
      .map(j => ('a' + ((seed * 31 + j * j) % 7)).toChar).mkString
    val rows = (0L until 8L).flatMap { b =>
      val s = mk(b)
      Seq((b * 4, s),
        (b * 4 + 1, s.updated(497, if (s(497) == 'a') 'b' else 'a')),
        (b * 4 + 2, s.updated(200, 'z').updated(801, 'z')),
        (b * 4 + 3, mk(b + 1000)))
    }
    val df = rows.toDF("id", "s").repartition(5)
    for (d <- 1 to 2) assert(fast(df, d) === naive(df, d), s"d=$d")
  }

  test("partitioning invariance") {
    val df = (0L until 200L).map(i => (i, s"v${i % 40}_${"ab" * (i % 3).toInt}"))
      .toDF("id", "s")
    assert(fast(df.repartition(1), 2) === fast(df.repartition(13), 2))
  }
}
