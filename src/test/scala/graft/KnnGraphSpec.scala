package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Mutual k-NN graph (e7) and its LSH-bucketed corpus-scale twin. */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64

  /** Two tight clusters of near-identical vectors plus lone outliers:
    * cluster members' reciprocal top-k are each other, so every
    * in-cluster edge must be mutual. Deterministic float noise keeps
    * neighbor ranks total-ordered. */
  private def fixture: DataFrame = {
    def vec(axis: Int, id: Long): Array[Float] = {
      val a = new Array[Float](dims)
      a(axis) = 1f
      a((axis + 7) % dims) = 0.001f * ((id % 5) + 1)
      a
    }
    val rows =
      (0L until 5L).map(i => (i, vec(0, i))) ++ // cluster A: ids 0-4
      (10L until 15L).map(i => (i, vec(1, i))) ++ // cluster B: ids 10-14
      Seq((20L, vec(2, 20L)), (21L, vec(3, 21L))) // outliers
    rows.toDF("vec_id", "embedding")
  }

  test("every vector gets at most k edges, ranked 1..k, no self-edges") {
    val g = Similarity.knnGraph(fixture, "vec_id", "embedding", k = 3)
    val perSrc = g.groupBy("src_id").agg(count(lit(1)).as("n"),
      max("rnk").as("mx"), min("rnk").as("mn"))
    assert(perSrc.filter(col("n") > 3 || col("mx") > 3 || col("mn") < 1)
      .isEmpty)
    assert(g.filter(col("src_id") === col("dst_id")).isEmpty)
  }

  test("mutual edges stay inside clusters; cluster-crossing edges never reciprocate") {
    // NOT every in-cluster edge is mutual (k=3 inside a 5-clique leaves
    // room for one-way picks) — the guarantees are: mutual edges exist
    // inside each cluster, and no mutual edge crosses cluster lines
    val g = Similarity.knnGraph(fixture, "vec_id", "embedding", k = 3)
      .select(col("src_id"), col("dst_id"), col("mutual"))
      .as[(Long, Long, Boolean)].collect()
    val cluster = (id: Long) => if (id < 5) 0 else if (id < 15) 1 else 2 + id
    assert(g.exists(e => e._3 && cluster(e._1) == 0 && cluster(e._2) == 0))
    assert(g.exists(e => e._3 && cluster(e._1) == 1 && cluster(e._2) == 1))
    val crossing = g.filter(e => cluster(e._1) != cluster(e._2))
    assert(crossing.nonEmpty && crossing.forall(!_._3),
      "a near-orthogonal target whose own top-k is its dense cluster never reciprocates")
  }

  test("mutual flag is symmetric: (a,b) mutual iff (b,a) mutual") {
    val g = Similarity.knnGraph(fixture, "vec_id", "embedding", k = 3)
      .select(col("src_id"), col("dst_id"), col("mutual"))
      .as[(Long, Long, Boolean)].collect()
    val mutuals = g.filter(_._3).map(e => (e._1, e._2)).toSet
    assert(mutuals.nonEmpty)
    assert(mutuals.forall { case (a, b) => mutuals.contains((b, a)) })
  }

  test("mutual edges + components recover the planted clusters") {
    val g = Similarity.knnGraph(fixture, "vec_id", "embedding", k = 3)
    val comp = Dedup.connectedComponents(
        g.filter(col("mutual")).select(col("src_id").as("id_a"),
          col("dst_id").as("id_b")))
      .as[(Long, Long)].collect().toMap
    assert((0L until 5L).map(comp).toSet.size == 1, "cluster A is one component")
    assert((10L until 15L).map(comp).toSet.size == 1, "cluster B is one component")
    assert(comp(0L) != comp(10L), "clusters stay separate")
  }

  test("bucketed twin recovers the exact graph's mutual in-cluster edges") {
    // tight clusters project to the same side of every hyperplane, so
    // same-bucket candidates contain the whole cluster
    val exact = Similarity.knnGraph(fixture, "vec_id", "embedding", k = 3)
    val approx = Similarity.knnGraphBucketed(fixture, "vec_id", "embedding",
      k = 3, nPlanes = 2, dims = dims)
    val exactMutual = exact.filter(col("mutual"))
      .filter(col("src_id") < 15 && col("dst_id") < 15)
      .select("src_id", "dst_id").as[(Long, Long)].collect().toSet
    val approxEdges = approx.select("src_id", "dst_id")
      .as[(Long, Long)].collect().toSet
    val recovered = exactMutual.intersect(approxEdges)
    assert(recovered == exactMutual,
      s"missing ${exactMutual.diff(approxEdges)}")
  }

  test("banded twin: tables union candidates and recall dominates one table") {
    // on the real sf fixture (near-uniform vectors — the hard case for
    // LSH) the 4x3-plane banded union must recover strictly more of
    // the exact graph than a single 3-plane table, and pairs caught by
    // several tables must appear once (dedup before top-k)
    val vecs = Tables.embeddings(spark, sf).filter(col("vec_id") % 10 === 0)
    val exact = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 4)
      .select(col("src_id").as("query_id"), col("dst_id").as("neighbor_id"))
    def recall(g: DataFrame): Double =
      Similarity.recallAtK(exact,
          g.select(col("src_id").as("query_id"),
            col("dst_id").as("neighbor_id")), 4)
        .agg(avg(col("recall_at_4"))).head().getDouble(0)
    val banded = Similarity.knnGraphBanded(vecs, "vec_id", "embedding",
      k = 4, planesPerTable = 3, nTables = 4)
    val single = Similarity.knnGraphBucketed(vecs, "vec_id", "embedding",
      k = 4, nPlanes = 3)
    assert(banded.groupBy("src_id", "dst_id").count()
      .filter(col("count") > 1).isEmpty, "duplicate edges survived banding")
    val (rb, rs) = (recall(banded), recall(single))
    assert(rb > rs, s"banded $rb should beat single-table $rs")
    assert(rb >= 0.3, s"banded recall $rb under the e8 floor")
  }
}
