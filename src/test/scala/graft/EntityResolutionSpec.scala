package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.EntityResolution
import graft.operators.EntityResolution.ErField

/** Multi-field ER (q80). Every test compares against the naive
  * crossJoin + same-score plan — a missed pair (blocking false
  * negative) breaks set equality, the failure mode the per-field
  * candidate union must never have. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def scoreCol(fields: Seq[ErField], side: (String, String)) = {
    val (ap, bp) = side
    fields.map { f =>
      val (a, b) = (col(ap + f.name), col(bp + f.name))
      if (f.maxDist == 0)
        when(a.isNotNull && a === b, lit(f.weight)).otherwise(lit(0.0))
      else
        when(levenshtein(a, b) <= f.maxDist,
          lit(f.weight) * (lit(1.0) -
            levenshtein(a, b).cast("double") / lit((f.maxDist + 1).toDouble)))
          .otherwise(lit(0.0))
    }.reduce(_ + _)
  }

  private def naive(df: DataFrame, fields: Seq[ErField],
                    minScore: Double): Set[(Long, Long, Double)] = {
    val a = df.select(col("id").as("id_a") +:
      fields.map(f => col(f.name).as("a_" + f.name)): _*)
    val b = df.select(col("id").as("id_b") +:
      fields.map(f => col(f.name).as("b_" + f.name)): _*)
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("score", scoreCol(fields, ("a_", "b_")))
      .filter(col("score") >= minScore)
      .select("id_a", "id_b", "score")
      .as[(Long, Long, Double)].collect().toSet
  }

  private def fast(df: DataFrame, fields: Seq[ErField],
                   minScore: Double): Set[(Long, Long, Double)] =
    EntityResolution.entityPairs(df, "id", fields, minScore)
      .as[(Long, Long, Double)].collect().toSet

  private val fields = Seq(ErField("name", 2, 0.5),
    ErField("code", 0, 0.3), ErField("city", 1, 0.2))

  test("hand fixture: every qualifying field combination, nulls never match") {
    val df = Seq(
      // 1-2: exact name (0.5) — name blocking alone must catch
      (1L, "alice johnson", "c1", "berlin"),
      (2L, "alice johnson", "c9", "munich"),
      // 3-4: code + city exact (0.3+0.2=0.5) with name beyond d=2 —
      // only the exact-field blocks catch this pair
      (3L, "robert zzz", "c7", "paris"),
      (4L, "maria qqq", "c7", "paris"),
      // 5-6: name dist 1 (0.5*(2/3)=0.333...) + code (0.3) = 0.633
      (5L, "john smith", "c2", "x"),
      (6L, "john smyth", "c2", "y"),
      // 7-8: name dist 2 (0.5/3=0.1667) + city dist 1 (0.2*0.5=0.1)
      // = 0.2667 < 0.4 — candidates generated but verify prunes
      (7L, "anna braun", "c3", "bonn"),
      (8L, "arno braun", "c4", "bona"),
      // 9-10: null name and null city never match (even null=null);
      // code alone = 0.3 < 0.4
      (9L, null, "c5", null),
      (10L, null, "c5", null),
      // 11: isolated
      (11L, "completely other", "c8", "lisbon")
    ).toDF("id", "name", "code", "city")
    val got = fast(df, fields, 0.4)
    assert(got === naive(df, fields, 0.4))
    val pairs = got.map(p => (p._1, p._2))
    assert(pairs.contains((1L, 2L)) && pairs.contains((3L, 4L)) &&
      pairs.contains((5L, 6L)))
    assert(!pairs.contains((7L, 8L)) && !pairs.contains((9L, 10L)))
    // score bits match the naive plan exactly (same fixed-order sum)
    assert(got === naive(df, fields, 0.4))
  }

  test("matches brute force on a 240-record corpus with planted multi-field mutations") {
    // Deterministic records; every id%4==1 mutates id-1's name by one
    // substitution, id%4==2 shares id-2's code+city with a fresh name,
    // id%4==3 is noise. Cities drawn from 12 values so exact-field
    // buckets are hot; codes from 30.
    val recs = (0L until 240L).map { i =>
      val base = (0 until (8 + (i / 4 % 5)).toInt)
        .map(j => ('a' + ((i / 4 * 11 + j * 3) % 9)).toChar).mkString
      val code = s"c${i / 4 % 30}"
      val city = s"city_${i / 4 % 12}"
      i % 4 match {
        case 0 => (i, base, code, city)
        case 1 => (i, "z" + base.drop(1), s"c${(i / 4 + 7) % 30}", city)
        case 2 => (i, base.reverse + "qq", code, city)
        case _ => (i, base + "xyz", s"n$i", s"t$i")
      }
    }
    val df = recs.toDF("id", "name", "code", "city").repartition(7)
    for (ms <- Seq(0.2, 0.4, 0.5)) {
      val got = fast(df, fields, ms)
      assert(got === naive(df, fields, ms), s"mismatch at minScore=$ms")
      assert(got.nonEmpty)
    }
  }

  test("single exact field degenerates to a self-equi-join") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, null))
      .toDF("id", "k")
    val got = fast(df, Seq(ErField("k", 0, 1.0)), 0.5)
    assert(got === Set((1L, 2L, 1.0)))
  }

  test("partitioning invariance") {
    val recs = (0L until 120L).map { i =>
      (i, s"name_${i % 20}", s"c${i % 9}", s"city_${i % 6}")
    }
    val df = recs.toDF("id", "name", "code", "city")
    assert(fast(df.repartition(1), fields, 0.4) ===
      fast(df.repartition(13), fields, 0.4))
  }
}
