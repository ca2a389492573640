package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-2 extension operators: embedding dedup, window suite,
  * grouping sets, binary feature plumbing. */
class ExtensionOpsSpec extends SparkSpec {
  import spark.implicits._

  test("lshDedup drops exactly the planted exact-duplicate vectors") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val originals = emb.select($"vec_id").as[Long].collect().toSet
    val planted = emb.unionByName(emb.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 1000000).as("vec_id"), $"embedding"))
    val kept = Similarity.lshDedup(planted, "vec_id", "embedding",
      nPlanes = 8, threshold = 0.99).as[Long].collect().toSet
    // an exact copy shares every LSH bucket with its source and scores
    // sim == 1.0, so every planted id (> 1e6, the higher of each pair)
    // is dropped and every original survives
    assert(kept == originals)
  }

  test("window suite: per-partition boundary semantics") {
    val rows = SparkEntry.queries("q39_window_suite")(spark, sf)
      .orderBy($"event_type", $"metric_date").collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toString)
      assert(sorted.head.getLong(3) == -1L)        // first prev_n = -1
      assert(sorted.last.getLong(4) == -1L)        // last next_n = -1
      val firstN = sorted.head.getLong(2)
      assert(sorted.forall(_.getLong(7) == firstN)) // first_n constant
      val maxN = rs.map(_.getLong(2)).max
      assert(rs.filter(_.getInt(5) == 1).forall(_.getLong(2) == maxN)) // rk 1 = max n
      assert(rs.map(_.getInt(6)).toSet.subsetOf((1 to 4).toSet))       // ntile ∈ 1..4
    }
  }

  test("grouping sets: grand total row reconciles with per-type rows") {
    val rows = SparkEntry.queries("q40_grouping_sets")(spark, sf).collect()
    val grand = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(grand.length == 1)
    val total = grand.head.getLong(4)
    val perType = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 1)
    assert(perType.map(_.getLong(4)).sum == total)
    val perMonth = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 0)
    assert(perMonth.map(_.getLong(4)).sum == total)
  }

  test("binary features match JVM-computed bytes for a sampled doc") {
    val doc = Tables.documents(spark, sf).select($"doc_id", $"text")
      .orderBy($"doc_id").limit(1).collect().head
    val bytes = doc.getString(1).getBytes("UTF-8")
    val hx = bytes.map(b => f"${b & 0xff}%02X").mkString
    val got = SparkEntry.queries("m2_binary_features")(spark, sf)
      .filter($"doc_id" === doc.getLong(0)).collect().head
    assert(got.getInt(1) == bytes.length)
    assert(got.getString(2) == hx.take(16))
    assert(got.getString(3) == hx.takeRight(16))
    assert(got.getInt(5) == bytes.length % 3 + 1)
  }

  test("vector stats: norms positive, dim 64, avg within [min, max]") {
    val rows = SparkEntry.queries("e4_vector_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) == 64)
      val (mn, mx, avg) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mn > 0 && mn <= mx)
      assert(avg >= mn - 1e-6 && avg <= mx + 1e-6)
    }
  }
}
