package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Invariants for the corpus-mix sampling operators (q72/q73) and the
  * round-6 scoring/curation queries (t14/c3). The cross-engine value
  * gate is the DuckDB oracle; these specs pin the semantic properties
  * the oracle cannot express: determinism, rebalance direction,
  * permutation validity.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def skewedDocs = {
    // 1 mega domain (1000 docs), 10 mid (50 each), 100 tail (2 each)
    spark.range(1700).select(col("id").as("doc_id"),
      when(col("id") < 1000, "mega.com")
        .when(col("id") < 1500, concat(lit("mid"), (col("id") % 10).cast("string")))
        .otherwise(concat(lit("tail"), (col("id") % 100).cast("string")))
        .as("domain"))
  }

  test("temperatureSample rebalances toward sqrt: mega-domain rate < tail rate") {
    val out = Sampling.temperatureSample(skewedDocs, "doc_id", col("domain"),
      targetTotal = 400).cache()
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val (megaN, megaK) = rows.find(_._1 == "mega.com").map(r => (r._2, r._3)).get
    val tail = rows.filter(_._1.startsWith("tail"))
    val tailRate = tail.map(_._3).sum.toDouble / tail.map(_._2).sum
    assert(megaK.toDouble / megaN < tailRate,
      "sqrt rebalance must sample the mega domain at a lower rate than the tail")
    // expected total is targetTotal in expectation; allow hash variance
    val total = rows.map(_._3).sum
    assert(total > 150 && total < 800, s"kept $total, expected ~400")
  }

  test("temperatureSample is deterministic and respects the rate cap") {
    val a = Sampling.temperatureSample(skewedDocs, "doc_id", col("domain"), 400)
      .orderBy("domain").collect().toSeq
    val b = Sampling.temperatureSample(skewedDocs, "doc_id", col("domain"), 400)
      .orderBy("domain").collect().toSeq
    assert(a == b)
    a.foreach { r =>
      assert(r.getLong(2) <= (1L << 20), "threshold must cap at the ring size")
      assert(r.getLong(3) <= r.getLong(1), "cannot keep more than exists")
    }
  }

  test("epochShuffle emits a valid permutation per epoch with distinct orders") {
    val docs = spark.range(500).select(col("id").as("doc_id"))
    val out = Sampling.epochShuffle(docs, "doc_id", epochs = 2,
      targetDocsPerShard = 64).cache()
    assert(out.count() == 1000)
    // every doc appears exactly once per epoch
    assert(out.groupBy("epoch", "doc_id").count().filter(col("count") =!= 1)
      .isEmpty)
    // positions within each (epoch, shard) are contiguous 1..n
    val bad = out.groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
    assert(bad.isEmpty, "per-shard positions must be a contiguous 1..n run")
    // epoch 1 and epoch 2 orders differ (hash keyed by epoch)
    val o1 = out.filter(col("epoch") === 1).orderBy("shard", "pos")
      .select("doc_id").as[Long].collect().toSeq
    val o2 = out.filter(col("epoch") === 2).orderBy("shard", "pos")
      .select("doc_id").as[Long].collect().toSeq
    assert(o1 != o2, "epochs must produce different read orders")
    assert(o1.sorted == o2.sorted)
  }

  test("t14 lm score: fixed-point probabilities stay in [0, 1e6] and repeated text scores higher") {
    val out = SparkEntry.queries("t14_lm_score")(spark, sf)
    val rows = out.select("n_bigrams", "score_fp", "lm_score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mean = r.getLong(1).toDouble / r.getLong(0)
      assert(mean >= 0 && mean <= 1000000.0, s"mean fixed-point prob $mean")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("t14 lm score excludes docs without bigrams (matching its oracle)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val nWithBigrams = docs
      .filter(size(graft.functions.TextFunctions.tokens(col("text"))) > 1)
      .count()
    val out = SparkEntry.queries("t14_lm_score")(spark, sf)
    assert(out.count() == nWithBigrams,
      "every doc with >= 2 tokens must receive a score; shorter docs are excluded by contract")
  }

  test("priority sample: matches the naive per-group rank and excludes non-positive weights") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("en", 1L, 100L), ("en", 2L, 5000L), ("en", 3L, 40L), ("en", 4L, 900L),
      ("de", 5L, 10L), ("de", 6L, 10L), ("de", 7L, 0L), ("fr", 8L, -3L))
    val df = rows.toDF("lang", "doc_id", "w")
    val out = Sampling.prioritySample(df, Seq("lang"), col("doc_id"), col("w"), k = 2)
      .select("lang", "doc_id", "rnk").as[(String, Long, Int)].collect().toSet
    // naive recomputation of the same deterministic priorities
    val M = 2147483647L
    def pr(id: Long, w: Long): Double =
      w.toDouble / (1L + ((id % (M - 1)) * 48271) % M).toDouble
    val expect = rows.filter(_._3 > 0).groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(r => (-pr(r._2, r._3), r._2)).take(2).zipWithIndex
        .map { case (r, i) => (g, r._2, i + 1) }
    }.toSet
    assert(out == expect)
    assert(!out.exists(_._2 == 7L) && !out.exists(_._2 == 8L),
      "zero/negative weight rows can never be sampled")
  }

  test("priority sample: identical across shuffle parallelism and plans a group-limit") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), col("n_chars"))
    def run() = Sampling.prioritySample(docs, Seq("lang"), col("doc_id"),
      col("n_chars"), k = 5)
    val a = run().orderBy("lang", "rnk").collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = run().orderBy("lang", "rnk").collect().toSeq
      assert(a == b, "sample must not depend on cluster layout")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // the rank-limit must sit below the exchange: only <=k rows per
    // group per mapper may reach the shuffle at 100 TB
    val plan = run().queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("dsirSelect ranks target-vocabulary docs above off-target docs") {
    // target docs speak vocabulary A, raw-only docs vocabulary B, and
    // a few candidate docs mix both: the A-heavy candidate must
    // outscore the B-heavy one, because A-buckets carry positive
    // weight (over-represented in target) and B-buckets negative.
    val docs = Seq(
      (0L, "alpha beta gamma alpha beta", true),
      (1L, "alpha gamma beta beta gamma", true),
      (2L, "delta epsilon zeta delta zeta", false),
      (3L, "delta zeta epsilon epsilon", false),
      (10L, "alpha beta gamma", false), // A-heavy candidate
      (11L, "delta epsilon zeta", false), // B-heavy candidate
      (12L, "alpha delta", false)) // mixed
      .toDF("doc_id", "text", "tgt")
    val out = Sampling.dsirSelect(docs, "doc_id", col("text"), col("tgt"),
      k = 10).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(10L) > out(12L) && out(12L) > out(11L),
      s"A-heavy > mixed > B-heavy expected, got $out")
    assert(out(0L) > 0 && out(11L) < 0,
      s"target-vocab scores positive, off-target negative, got $out")
  }

  test("dsirSelect: top-k contract, determinism, and layout independence") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"),
      (col("lang") === "en").as("tgt"))
    def run() = Sampling.dsirSelect(docs, "doc_id", col("text"), col("tgt"),
      k = 25)
    val a = run().collect().toSeq
    assert(a.size == 25)
    // scores arrive non-increasing with doc_id tiebreak
    val pairs = a.map(r => (r.getLong(1), r.getLong(0)))
    assert(pairs.sliding(2).forall { case Seq((s1, d1), (s2, d2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2) },
      "top-k must be ordered by score desc, doc_id asc")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(run().collect().toSeq == a, "selection must not depend on layout")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("DSIR stats are additive: incremental fold equals full recompute") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"),
      (col("lang") === "en").as("tgt"))
    val a = docs.filter(col("doc_id") % 3 === 0)
    val b = docs.filter(col("doc_id") % 3 =!= 0)
    val folded = Sampling.combineDsirStats(
      Sampling.dsirStats(a, col("text"), col("tgt")),
      Sampling.dsirStats(b, col("text"), col("tgt")))
    val full = Sampling.dsirStats(docs, col("text"), col("tgt"))
    assert(folded.exceptAll(full).isEmpty && full.exceptAll(folded).isEmpty,
      "stats(A) ⊎ stats(B) must equal stats(A ∪ B) bucket-for-bucket")
    // and the selection driven by folded stats equals the full one
    val selFolded = Sampling.dsirSelectWithStats(docs, "doc_id",
      col("text"), folded, k = 25).collect().toSeq
    val selFull = Sampling.dsirSelectWithStats(docs, "doc_id",
      col("text"), full, k = 25).collect().toSeq
    assert(selFolded == selFull)
  }

  test("priority sample fold: k-mergeable — fold(state, batch) == full recompute") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), col("n_chars"))
    val state = Sampling.prioritySample(docs, Seq("lang"),
      col("doc_id"), col("n_chars"), k = 5)
    val batch = Tables.documents(spark, sf).filter(col("doc_id") % 11 === 0)
      .select(col("lang"), (col("doc_id") + 1000000L).as("doc_id"),
        (col("n_chars") * 1000).as("n_chars"))
    val folded = Sampling.prioritySampleFold(state, batch, Seq("lang"),
      col("doc_id"), col("n_chars"), k = 5)
    val full = Sampling.prioritySample(docs.unionByName(batch), Seq("lang"),
      col("doc_id"), col("n_chars"), k = 5)
    assert(folded.exceptAll(full).isEmpty && full.exceptAll(folded).isEmpty,
      "fold must equal the full recompute bit-for-bit")
    // and the batch genuinely contends: at least one +1e6 id wins a slot
    assert(folded.filter(col("doc_id") >= 1000000L).count() > 0,
      "fixture must make batch rows actually enter the sample")
  }

  test("DSIR overflow guard fails LOUDLY past the BIGINT score bound") {
    // a foreign stats frame whose counts keep every INTERMEDIATE
    // product in-range (so ANSI doesn't trip first) but push the
    // ntok·max|w| bound past 2^62 — the regime where a non-ANSI
    // engine would wrap silently (ADVICE r10); the in-plan gate must
    // raise with its own message, not return bogus scores. Here
    // max|w| = 63·2^55 ≈ 2^61, so 4 tokens cross the 2^62 line while
    // the actual score sum stays far below 2^63.
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val huge = Seq.tabulate(64)(b =>
      (b.toLong, 1L << 55, if (b == 0) 1L else 0L))
      .toDF("b", "rc", "tc")
    val ex = intercept[Exception] {
      Sampling.dsirSelectWithStats(docs, "doc_id", col("text"), huge, k = 5)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("dsir_score_overflow")),
      s"expected the overflow gate to fire, got: ${messages(ex).mkString(" | ")}")
  }

  test("DSIR candidate contract: zero-token docs are excluded, not scored 0") {
    val docs = Seq((1L, "alpha beta"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text").withColumn("tgt", lit(true))
    val sel = Sampling.dsirSelect(docs, "doc_id", col("text"), col("tgt"),
      k = 10).select("doc_id").as[Long].collect().toSet
    assert(sel == Set(1L), s"only the tokenful doc competes; got $sel")
  }

  test("c3 funnel: domain caps hold and quality is averaged over kept docs only") {
    val out = SparkEntry.queries("c3_training_corpus")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) <= 50, "domain cap must bound every domain at 50")
      val q = r.getDouble(3)
      assert(q >= 0.2 && q <= 1.0, s"kept docs passed the 0.2 floor, got $q")
    }
  }
}
