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

  // Same deterministic 40-doc corpus as the brute-force test, split
  // by parity into a persisted-index corpus and a probing batch.
  private def wideDocs = {
    val vocab = Array("t0", "t1", "t2", "t3", "t4", "t5", "t6", "t7")
    (0 until 40).map { i =>
      val words = (0 until 12).map(j => vocab((i * 7 + j * j) % 8))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("incremental: index probe equals full-corpus pairs restricted to cross pairs") {
    // The raw fixture's near-identical docs repeat with period 8
    // (same parity), so cross-parity pairs are planted: odd-id
    // near-dup clones of the even docs (12-token docs, so appending
    // one token keeps cos ≥ √(12/13) ≈ 0.96).
    val corpus = wideDocs.filter(col("doc_id") % 2 === 0)
    val clones = corpus.select((col("doc_id") + 101L).as("doc_id"),
      concat(col("text"), lit(" zz")).as("text"))
    val batch = wideDocs.filter(col("doc_id") % 2 === 1).unionByName(clones)
    val index = Apss.buildIndex(corpus, "doc_id", "text", 9, 10)
    val inc = Apss.incrementalPairs(index, batch, "doc_id", "text", 9, 10)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (a, b, dot, na, nb) =>
        if (a < b) (a, b, dot, na, nb) else (b, a, dot, nb, na)
      }.toSet
    val cross = Apss.cosinePairs(wideDocs.unionByName(clones),
        "doc_id", "text", 9, 10)
      .filter(col("doc_a") % 2 =!= col("doc_b") % 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(inc === cross)
    assert(cross.nonEmpty) // fixture actually crosses the split
  }

  test("open-world index keeps a pair the corpus-relative Bayardo bound would drop") {
    // Corpus doc 1 = x⁹y⁴: ‖x-prefix‖² = 81/97 ≈ 0.835, so the
    // closed-world flag (least(cum, pnorm) with cum = Σw·maxw ≈
    // 0.835 < 0.9) SKIPS x, while the open-world ℓ² flag (pnorm =
    // √0.835 ≈ 0.914 ≥ 0.9) indexes it. Batch doc 10 = "x" puts ALL
    // its mass on x — cos(1,10) = 9/√97 ≈ 0.914 ≥ 0.9 is a true pair
    // reachable ONLY through x, so a cum-flagged index would lose it.
    val corpus = Seq(
      (1L, Array.fill(9)("x").mkString(" ") + " y y y y"),
      (2L, "x q q q q"), // second x carrier: df(x)=2 orders x first
      (3L, "p p p")
    ).toDF("doc_id", "text")
    val batch = Seq((10L, "x")).toDF("doc_id", "text")

    // The scenario is real: the closed-world flag on this corpus
    // does NOT index x for doc 1, the open-world flag does.
    val closed = Apss.flaggedPostings(corpus, "doc_id", "text", 9, 10)
      .filter(col("id") === 1 && col("term") === "x")
      .select("indexed").as[Boolean].head()
    assert(!closed)
    val index = Apss.buildIndex(corpus, "doc_id", "text", 9, 10)
    val open = index.filter(col("id") === 1 && col("term") === "x")
      .select("indexed").as[Boolean].head()
    assert(open)

    val inc = Apss.incrementalPairs(index, batch, "doc_id", "text", 9, 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // dot = 9, na = 97, nb = 1: 100·81 = 8100 ≥ 81·97 = 7857 ✓;
    // doc 2 vs batch has cos = 1/√5 < 0.9, doc 3 shares nothing.
    assert(inc === Set((1L, 10L, 9L, 97L, 1L)))
  }
}
