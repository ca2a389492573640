package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Semantic dedup (d20): cluster-then-dedup semantics the DuckDB value
  * gate cannot express — keep-lowest-id within cluster, cross-cluster
  * blindness, determinism, and the survivor contract on clone-planted
  * corpora. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64

  /** Three tight axis clusters; ids 100+ are exact clones of ids 0-2
    * (one per cluster), id 50 is a lone far vector. Within a cluster,
    * cosine(original, clone) = 1; across clusters cosine = 0. */
  private def fixture: DataFrame = {
    def vec(axis: Int, wiggle: Float): Array[Float] = {
      val a = new Array[Float](dims)
      a(axis) = 1f
      a(axis + 10) = wiggle
      a
    }
    val rows = Seq(
      (0L, vec(0, 0f)), (1L, vec(1, 0f)), (2L, vec(2, 0f)),
      // near members: same axis, small wiggle -> cosine ~0.9999
      (10L, vec(0, 0.01f)), (11L, vec(1, 0.01f)),
      // exact clones of 0, 1, 2
      (100L, vec(0, 0f)), (101L, vec(1, 0f)), (102L, vec(2, 0f)),
      // lone far vector
      (50L, vec(7, 0f)))
    rows.toDF("vec_id", "embedding")
  }

  test("exact clones drop, lowest id survives, lone vectors always survive") {
    val out = Similarity.semDedup(fixture, "vec_id", "embedding",
      tau = 0.999, nCentroids = 4).cache()
    val kept = out.select("vec_id").as[Long].collect().toSet
    assert(!kept.contains(100L) && !kept.contains(101L) && !kept.contains(102L),
      s"clones must drop, kept=$kept")
    assert(kept.contains(0L) && kept.contains(1L) && kept.contains(2L),
      "lowest-id originals must survive")
    assert(kept.contains(50L), "the lone vector has no tau-neighbor")
    // id 10 is itself a centroid (4 lowest ids = 0,1,2,10) so it owns
    // its cluster and its tau-pair with 0 is cross-cluster — blind by
    // design; id 11 lands in cluster 1 beside vec 1 and drops
    assert(kept.contains(10L) && !kept.contains(11L), s"kept=$kept")
  }

  test("tau above the near-member similarity keeps near members") {
    val out = Similarity.semDedup(fixture, "vec_id", "embedding",
      tau = 0.99999, nCentroids = 4)
    val kept = out.select("vec_id").as[Long].collect().toSet
    assert(kept.contains(10L) && kept.contains(11L),
      "wiggled members are below the tighter tau and must survive")
    assert(!kept.contains(100L), "exact clones are above any tau < 1")
  }

  test("survivors carry their cluster id and the result is deterministic") {
    val a = Similarity.semDedup(fixture, "vec_id", "embedding",
      tau = 0.999, nCentroids = 4).orderBy("vec_id").collect().toSeq
    val b = Similarity.semDedup(fixture, "vec_id", "embedding",
      tau = 0.999, nCentroids = 4).orderBy("vec_id").collect().toSeq
    assert(a == b)
    // centroid ids come from the deterministic lowest-id seed
    val cids = a.map(_.getLong(1)).toSet
    assert(cids.subsetOf(Set(0L, 1L, 2L, 10L)),
      s"centroid ids must be the 4 lowest vec_ids, got $cids")
  }

  test("dedup is cluster-local: a tau-pair split across clusters never drops") {
    // SemDeDup's documented blindness: a similar pair whose members
    // land in DIFFERENT clusters is never compared (the paper accepts
    // this; raising nCentroids shrinks cluster diameter, not recall
    // of cross-cluster pairs). v0 sits on axis 3; v1 leans 0.2 toward
    // axis 4; centroid c1 leans 0.3 — so v1's nearest centroid is c1
    // while v0 stays on c0, yet cos(v0, v1) ≈ 0.98 >= tau.
    def lean(w4: Float): Array[Float] = {
      val a = new Array[Float](dims); a(3) = 1f; a(4) = w4; a
    }
    val vecs = Seq((0L, lean(0f)), (1L, lean(0.2f))).toDF("vec_id", "embedding")
    val cents = Seq((0L, lean(0f)), (1L, lean(0.3f))).toDF("centroid_id", "centroid_vec")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding", tau = 0.9,
        nCentroids = 2, centroids = Some(cents))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.keySet == Set(0L, 1L), s"split pair must both survive, got $out")
    assert(out(0L) == 0L && out(1L) == 1L, s"expected split assignment, got $out")
  }

  test("keep rules: same pair set dropped, different representative kept") {
    // one cluster around centroid c0 (axis 3). Member 1 hugs the
    // centroid; member 2 leans away (farther from c0); cos(1, 2) is
    // still above tau. Keep-lowest-id keeps 1; the paper's
    // keep-farthest rule keeps 2 — SAME pair, different survivor.
    def lean(w: Float): Array[Float] = {
      val a = new Array[Float](dims); a(3) = 1f; a(4) = w; a
    }
    val vecs = Seq((1L, lean(0.05f)), (2L, lean(0.25f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, lean(0f))).toDF("centroid_id", "centroid_vec")
    def kept(farthest: Boolean): Set[Long] =
      Similarity.semDedup(vecs, "vec_id", "embedding", tau = 0.97,
          nCentroids = 1, centroids = Some(cents), keepFarthest = farthest)
        .select("vec_id").as[Long].collect().toSet
    assert(kept(farthest = false) == Set(1L),
      "keep-lowest-id must keep the lower id")
    assert(kept(farthest = true) == Set(2L),
      "keep-farthest must keep the member with the LOWER centroid cosine")
    // both rules saw (and dropped from) the same single pair: exactly
    // one survivor each — the pair set is rule-independent
    assert(kept(farthest = false).size == 1 && kept(farthest = true).size == 1)
  }

  test("keep-farthest ties (exact clones) fall back to the id tie-break") {
    def unit(axis: Int): Array[Float] = {
      val a = new Array[Float](dims); a(axis) = 1f; a
    }
    // exact clones: identical centroid cosine -> (csim, id) order
    // degenerates to the id order, matching keep-lowest-id
    val vecs = Seq((7L, unit(3)), (9L, unit(3))).toDF("vec_id", "embedding")
    val cents = Seq((0L, unit(3))).toDF("centroid_id", "centroid_vec")
    val kept = Similarity.semDedup(vecs, "vec_id", "embedding", tau = 0.99,
        nCentroids = 1, centroids = Some(cents), keepFarthest = true)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(7L), s"tie must keep the lowest id, got $kept")
  }

  test("fold == full recompute bit-exact, both keep rules; only receiving clusters touched") {
    def vec(axis: Int, wiggle: Float): Array[Float] = {
      val a = new Array[Float](dims); a(axis) = 1f; a(axis + 10) = wiggle; a
    }
    // corpus: three clusters + a lone vector; batch lands ONLY in
    // clusters 0 and 1 (cluster 2 and the lone axis stay untouched)
    val corpus = Seq(
      (0L, vec(0, 0f)), (1L, vec(1, 0f)), (2L, vec(2, 0f)),
      (10L, vec(0, 0.01f)), (11L, vec(1, 0.01f)),
      (50L, vec(7, 0f))).toDF("vec_id", "embedding")
    val batch = Seq(
      (200L, vec(0, 0f)),       // clone of 0 → drops
      (201L, vec(1, 0.02f)),    // near 1/11 → drops at tau .999
      (202L, vec(0, 0.5f))      // cluster 0 but dissimilar → keeps
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, vec(0, 0f)), (1L, vec(1, 0f)),
        (2L, vec(2, 0f)), (50L, vec(7, 0f)))
      .toDF("centroid_id", "centroid_vec")
    for (farthest <- Seq(false, true)) {
      val root = java.nio.file.Files.createTempDirectory("sem_fold").toString
      Similarity.buildSemDedupState(corpus, s"$root/state", "vec_id",
        "embedding", tau = 0.999, centroids = cents, keepFarthest = farthest)
      // file inventory BEFORE the fold, per cluster partition
      def inv(): Map[String, Long] = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$root/state"))
          .iterator().asScala
          .filter(p => p.toString.endsWith(".parquet"))
          .map(p => p.toString -> java.nio.file.Files
            .getLastModifiedTime(p).toMillis).toMap
      }
      val before = inv()
      Similarity.foldSemDedupState(spark, s"$root/state", batch, "vec_id",
        "embedding", tau = 0.999, centroids = cents, keepFarthest = farthest)
      val after = inv()
      // untouched clusters (cpart=2, cpart=50) keep their files verbatim
      val untouched = before.keySet.filter(p =>
        p.contains("cpart=2/") || p.contains("cpart=50/"))
      assert(untouched.nonEmpty)
      untouched.foreach { p =>
        assert(after.contains(p) && after(p) == before(p),
          s"unreceiving cluster file must be byte-untouched: $p")
      }
      // folded survivors == full recompute over corpus ∪ batch
      val got = Similarity.semDedupKept(spark, s"$root/state")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = Similarity.semDedup(corpus.unionByName(batch), "vec_id",
          "embedding", tau = 0.999, centroids = Some(cents),
          keepFarthest = farthest)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === full, s"farthest=$farthest fold=$got full=$full")
      // and the fold's pruned read carries the cluster partition filter
      val pruned = spark.read.parquet(s"$root/state")
        .filter(col("cpart").isin(0L, 1L))
      val planStr = pruned.queryExecution.executedPlan.toString
      assert(planStr.contains("PartitionFilters: [cpart"),
        planStr.take(2000))
    }
  }

  test("state keeps dropped members: a dropped witness still drops a newcomer") {
    // similarity is NOT transitive: corpus a(id 1) ~ b(id 2) with
    // cos ≥ tau drops b; batch c is similar to b but NOT to a. The
    // full recompute drops c (witness b precedes it) — kept-only
    // state would keep c and silently diverge. The persisted state
    // retains b precisely for this.
    def lean(w: Float): Array[Float] = {
      val a = new Array[Float](dims); a(3) = 1f; a(4) = w; a
    }
    // cos(lean(0), lean(0.3)) ≈ 0.958; cos(lean(0.3), lean(0.6)) ≈ .97
    // cos(lean(0), lean(0.6)) ≈ 0.857 — pick tau = 0.95
    val corpus = Seq((1L, lean(0f)), (2L, lean(0.3f)))
      .toDF("vec_id", "embedding")
    val batch = Seq((3L, lean(0.6f))).toDF("vec_id", "embedding")
    val cents = Seq((0L, lean(0.3f))).toDF("centroid_id", "centroid_vec")
    val root = java.nio.file.Files.createTempDirectory("sem_wit").toString
    Similarity.buildSemDedupState(corpus, s"$root/state", "vec_id",
      "embedding", tau = 0.95, centroids = cents)
    assert(Similarity.semDedupKept(spark, s"$root/state")
      .select("vec_id").as[Long].collect().toSet == Set(1L),
      "corpus: 2 drops against 1")
    Similarity.foldSemDedupState(spark, s"$root/state", batch, "vec_id",
      "embedding", tau = 0.95, centroids = cents)
    val got = Similarity.semDedupKept(spark, s"$root/state")
      .select("vec_id").as[Long].collect().toSet
    val full = Similarity.semDedup(corpus.unionByName(batch), "vec_id",
        "embedding", tau = 0.95, centroids = Some(cents))
      .select("vec_id").as[Long].collect().toSet
    assert(got === full)
    assert(got == Set(1L),
      s"dropped member 2 must still witness-drop newcomer 3, got $got")

    // the state's _meta pins (tau, keepFarthest, centroid fingerprint):
    // a fold with a different tau/rule mis-classifies pairs and moved
    // centroids re-assign old members, both silently — rejected loudly
    val batch2 = Seq((4L, lean(0.9f))).toDF("vec_id", "embedding")
    val wrongTau = intercept[IllegalArgumentException] {
      Similarity.foldSemDedupState(spark, s"$root/state", batch2,
        "vec_id", "embedding", tau = 0.9, centroids = cents)
    }
    assert(wrongTau.getMessage.contains("tau"))
    val wrongRule = intercept[IllegalArgumentException] {
      Similarity.foldSemDedupState(spark, s"$root/state", batch2,
        "vec_id", "embedding", tau = 0.95, centroids = cents,
        keepFarthest = true)
    }
    assert(wrongRule.getMessage.contains("keep_farthest"))
    val moved = Seq((0L, lean(0.31f))).toDF("centroid_id", "centroid_vec")
    val wrongCents = intercept[IllegalArgumentException] {
      Similarity.foldSemDedupState(spark, s"$root/state", batch2,
        "vec_id", "embedding", tau = 0.95, centroids = moved)
    }
    assert(wrongCents.getMessage.contains("centroid_fp"))
  }

  test("equal-cosine assignment tiebreaks to the lowest centroid id") {
    def unit(axis: Int): Array[Float] = {
      val a = new Array[Float](dims); a(axis) = 1f; a
    }
    val vecs = Seq((0L, unit(3)), (1L, unit(3))).toDF("vec_id", "embedding")
    val cents = Seq((0L, unit(3)), (1L, unit(3))).toDF("centroid_id", "centroid_vec")
    val kept = Similarity.semDedup(vecs, "vec_id", "embedding", tau = 0.9,
        nCentroids = 2, centroids = Some(cents))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // both score cosine 1 on both centroids -> both assigned to c0,
    // the pair IS seen, and keep-lowest-id drops vec 1
    assert(kept.toSeq == Seq((0L, 0L)),
      s"equal-cosine rows must co-locate on centroid 0 and dedup, got ${kept.toSeq}")
  }
}
