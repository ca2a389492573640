package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Product quantization ANN (e9): semantic properties the DuckDB value
  * gate cannot express — ADC exactness on codebook members, the
  * self-code optimality bound, and layout independence. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64

  /** Deterministic pseudo-random vectors; ids 0-15 double as the
    * codebook seed (lowest ids), so their codes reconstruct exactly. */
  private def fixture(n: Int, clonesOf: Seq[(Long, Long)] = Nil): DataFrame = {
    def vec(id: Long): Array[Float] =
      Array.tabulate(dims)(d =>
        (((id * 2654435761L + d * 40503L + 7) % 1009L).toFloat - 504f) / 504f)
    val rows = (0L until n.toLong).map(i => (i, vec(i))) ++
      clonesOf.map { case (newId, srcId) => (newId, vec(srcId)) }
    rows.toDF("vec_id", "embedding")
  }

  test("ADC distance is EXACT for candidates that are codebook members") {
    // candidates 1..15 are centroid seeds: each subspace code snaps to
    // the candidate's own subvector (distance 0), so the ADC sum
    // collapses to the true fixed-point L2 — PQ is exact there
    val vecs = fixture(16)
    val q = vecs.filter(col("vec_id") === 0)
    val pq = Similarity.pqTopK(vecs, q, "vec_id", "embedding", k = 15)
      .select("neighbor_id", "adist")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val exact = vecs.filter(col("vec_id") > 0)
      .crossJoin(q.select(col("embedding").as("qv")))
      .select(col("vec_id"),
        Similarity.l2Fixed(col("embedding"), col("qv")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pq == exact,
      s"ADC must equal exact fixed-point L2 on codebook members:\n$pq\nvs\n$exact")
  }

  test("a planted clone of the query attains the global-minimum ADC distance") {
    // code(q_j) minimizes every subspace term, so adist(q, clone) is
    // the global minimum over all candidates. It need not rank FIRST:
    // ADC cannot separate candidates sharing the clone's cell (they
    // tie bit-exactly and the id tiebreak decides) — that collapse is
    // PQ's documented resolution limit, not an implementation bug.
    val vecs = fixture(40, clonesOf = Seq((1000L, 25L)))
    val q = vecs.filter(col("vec_id") === 25)
    val all = Similarity.pqTopK(vecs, q, "vec_id", "embedding", k = 100)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val cloneDist = all.find(_._1 == 1000L).map(_._2)
    assert(cloneDist.contains(all.map(_._2).min),
      s"clone must tie the minimum ADC distance, got $cloneDist of ${all.toSeq}")
  }

  test("deterministic across shuffle parallelism; encoding uses no rank window") {
    val vecs = fixture(60)
    val q = vecs.filter(col("vec_id") < 4)
    def run() = Similarity.pqTopK(vecs, q, "vec_id", "embedding", k = 5)
    val a = run().orderBy("query_id", "rnk").collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = run().orderBy("query_id", "rnk").collect().toSeq
      assert(a == b, "PQ ranking must not depend on cluster layout")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // the encoder's argmin must be the partial-aggregable min_by, not
    // a second rank window — one Window total (the final top-k)
    val plan = run().queryExecution.executedPlan.toString
    val windows = "Window".r.findAllIn(plan).size
    assert(plan.contains("min_by") || windows <= 4,
      s"encoding argmin should aggregate, not window-rank:\n${plan.take(3000)}")
  }

  test("IVFPQ with all lists probed equals plain PQ; fewer probes shrink candidates only") {
    val vecs = fixture(60)
    val q = vecs.filter(col("vec_id") < 4)
    // nProbe = nCentroids -> every list probed -> candidate set is the
    // whole corpus, so the composition must reproduce e9 exactly
    val full = Similarity.ivfPqTopK(vecs, q, "vec_id", "embedding",
      k = 5, nCentroids = 16, nProbe = 16)
    val pq = Similarity.pqTopK(vecs, q, "vec_id", "embedding", k = 5)
    assert(full.exceptAll(pq).isEmpty && pq.exceptAll(full).isEmpty,
      "all-probes IVFPQ must equal plain PQ")
    // restricted probes: every returned pair keeps its EXACT PQ adist
    // (the coarse layer prunes candidates, never perturbs scores)
    val pruned = Similarity.ivfPqTopK(vecs, q, "vec_id", "embedding",
      k = 5, nCentroids = 16, nProbe = 2)
      .select(col("query_id"), col("neighbor_id"), col("adist"))
    val pqAll = Similarity.pqTopK(vecs, q, "vec_id", "embedding", k = 60)
      .select(col("query_id"), col("neighbor_id"), col("adist"))
    assert(pruned.join(pqAll, Seq("query_id", "neighbor_id", "adist"), "left_anti")
      .isEmpty, "IVFPQ adist must match PQ adist pair-for-pair")
  }

  test("residual IVFADC resolves within-cell structure: query clone wins at distance 0") {
    // 4 well-separated cells (centers = ids 0-3, magnitude 10); every
    // member is its center plus a small axis offset, so the WHOLE
    // within-cell signal lives in the residual. The codebook seeds
    // from non-centroid residuals (a centroid's own residual is zero
    // — seeding from it would collapse the codebook), and member 20's
    // residual is itself a seed: its clone must encode loss-free and
    // win at ADC distance exactly 0.
    def member(id: Long): Array[Float] = {
      val a = new Array[Float](dims)
      if (id < 4) a(id.toInt) = 10f
      else { a((id % 4).toInt) = 10f; a(10 + (id % 13).toInt) = 0.1f }
      a
    }
    val rows = (0L until 4L).map(i => (i, member(i))) ++
      (16L until 68L).map(i => (i, member(i))) ++ Seq((1000L, member(20L)))
    val vecs = rows.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 20)
    val out = Similarity.ivfPqResidualTopK(vecs, q, "vec_id", "embedding",
        k = 3, nCentroids = 4, nProbe = 2)
      .orderBy("rnk").collect()
    assert(out.head.getLong(1) == 1000L && out.head.getLong(2) == 0L,
      s"clone must win at adist 0, got ${out.toSeq}")
    assert(out(1).getLong(2) > 0L,
      s"non-clone cell-mates must score > 0, got ${out.toSeq}")
    val again = Similarity.ivfPqResidualTopK(vecs, q, "vec_id", "embedding",
      k = 3, nCentroids = 4, nProbe = 2).orderBy("rnk").collect()
    assert(out.toSeq == again.toSeq)
  }

  test("dims must split evenly into subspaces") {
    val vecs = fixture(16)
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(vecs, vecs.limit(1), "vec_id", "embedding", k = 3, m = 7)
    }
  }
}
