package graft

import org.apache.spark.sql.functions._
import graft.operators.Apss

/** All-pairs cosine similarity with prefix filtering (d17). The
  * planted fixture has hand-computable vectors; the brute-force
  * reference is the same integer threshold test evaluated over the
  * raw crossJoin, so any prefix-filter false negative shows up as a
  * missing pair. */
class ApssSpec extends SparkSpec {
  import spark.implicits._

  // aa ab: tf {aa:1, ab:1};  aa aa ab: tf {aa:2, ab:1} — cos = 3/√10 ≈ 0.949
  // xy zz: disjoint from both.  aa ab (dup): identical to doc 1, cos = 1.
  private def corpus = Seq(
    (1L, "aa ab"),
    (2L, "aa aa ab"),
    (3L, "xy zz"),
    (4L, "aa ab"),
    (5L, "qq qq qq")
  ).toDF("doc_id", "text")

  private def pairs(tauNum: Int, tauDen: Int) =
    Apss.cosinePairs(corpus, "doc_id", "text", tauNum, tauDen)
      .orderBy("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("exact pairs at tau=0.9: identical pair and the 0.949 pair, nothing else") {
    assert(pairs(9, 10).toSeq === Seq(
      (1L, 2L, 3L, 2L, 5L), // dot=2·1+1·1=3, ‖1‖²=2, ‖2‖²=5 → 100·9 ≥ 81·10 ✓
      (1L, 4L, 2L, 2L, 2L), // identical docs, cos=1
      (2L, 4L, 3L, 5L, 2L)
    ))
  }

  test("tau=1 keeps only exact duplicates (cos = 1)") {
    assert(pairs(1, 1).toSeq === Seq((1L, 4L, 2L, 2L, 2L)))
  }

  test("boundary inclusion: threshold test is >=, not >") {
    // docs (aa), (aa ab): dot=1, na=1, nb=2 → cos = 1/√2 ≈ 0.707107.
    // Integer test keeps the pair at τ just below 1/√2 and drops it
    // just above; float τ would make the boundary a rounding coin flip.
    val two = Seq((1L, "aa"), (2L, "aa ab")).toDF("doc_id", "text")
    val above = Apss.cosinePairs(two, "doc_id", "text", 7072, 10000).collect()
    assert(above.isEmpty) // 10⁸·dot² = 10⁸ < 7072²·2 = 100,026,368
    val below = Apss.cosinePairs(two, "doc_id", "text", 7071, 10000).collect()
    assert(below.length === 1) // 10⁸ ≥ 7071²·2 = 99,998,082 ✓
  }

  test("prefix filter loses nothing vs brute force on a wider random-ish corpus") {
    // 40 docs over an 8-term vocab with heavy reuse — dense enough
    // that most pairs share terms and the prefix filter must prune
    // without dropping. Deterministic construction (no RNG).
    val vocab = Array("t0", "t1", "t2", "t3", "t4", "t5", "t6", "t7")
    val docs = (0 until 40).map { i =>
      val words = (0 until 12).map(j => vocab((i * 7 + j * j) % 8))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")

    val fast = Apss.cosinePairs(docs, "doc_id", "text", 9, 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    // Brute force: same integer test over the full crossJoin.
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("bigint").as("tf"))
    val vec = tf.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("term"), col("tf"))))
          .as("vec"),
        sum(col("tf") * col("tf")).as("n2"))
    val a = vec.select(col("doc_id").as("doc_a"), col("vec").as("va"),
      col("n2").as("na"))
    val b = vec.select(col("doc_id").as("doc_b"), col("vec").as("vb"),
      col("n2").as("nb"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("dot",
        aggregate(map_entries(col("va")), lit(0L),
          (acc, e) => acc + e.getField("value") *
            coalesce(element_at(col("vb"), e.getField("key")), lit(0L))))
      .filter(lit(100L) * col("dot") * col("dot") >=
        lit(81L) * col("na") * col("nb"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    assert(fast === brute)
    assert(brute.nonEmpty) // fixture actually exercises the threshold
  }
}
