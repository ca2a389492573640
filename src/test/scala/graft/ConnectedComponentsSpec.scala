package graft

import graft.operators.Dedup

/** Pair list → dedup clusters via iterative min-label propagation. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains, triangles, and singleton pairs resolve to min-id components") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // both the driver union-find fast path and the distributed loop
    Seq(100000L, 0L).foreach { thr =>
      val got = Dedup.connectedComponents(pairs, localThreshold = thr)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"wrong components at localThreshold=$thr")
    }
  }

  test("foldComponents: merges, chains-of-merges, and new nodes equal a full recompute") {
    // old graph: {1,2,3}, {10,11}, {20,21}, singleton-free
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(oldPairs)
    // batch: bridges {1..3}–{10,11} AND transitively {10,11}–{20,21}
    // (two batch edges must chain through the component graph), plus
    // a brand-new pair {30,31} and a new node 40 attached to 20
    val batch = Seq((3L, 10L), (11L, 20L), (30L, 31L), (40L, 20L))
      .toDF("id_a", "id_b")
    // both mapping-CC paths (union-find and distributed)
    Seq(100000L, 0L).foreach { thr =>
      val folded = Dedup.foldComponents(labels, batch, localThreshold = thr)
        .as[(Long, Long)].collect().toMap
      val full = Dedup.connectedComponents(
          oldPairs.unionByName(batch))
        .as[(Long, Long)].collect().toMap
      assert(folded == full,
        s"fold must equal full recompute at localThreshold=$thr")
      assert(folded(40L) == 1L && folded(21L) == 1L && folded(30L) == 30L,
        s"expected the mega-merge to label everything 1, got $folded")
    }
    // a batch pair INSIDE one component is a no-op
    val same = Dedup.foldComponents(labels, Seq((1L, 3L)).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(same == labels.as[(Long, Long)].collect().toMap)
  }

  test("a 64-deep chain converges inside the default iteration budget") {
    // plain 1-hop label propagation needs depth rounds (64 > maxIter);
    // pointer jumping must close it in O(log d). localThreshold = 0
    // forces the DISTRIBUTED path — the driver fast path is exact by
    // construction and would mask a propagation bug
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, maxIter = 10, localThreshold = 0L)
      .as[(Long, Long)].collect()
    assert(got.length == 64)
    assert(got.forall(_._2 == 0L), s"chain not fully labeled: ${got.filter(_._2 != 0L).take(5).mkString(",")}")
  }

  test("real minhash pairs: every pair ends in one component") {
    val d = Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val corpus = d.unionByName(d.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 1000000).as("doc_id"),
        org.apache.spark.sql.functions.concat($"text",
          org.apache.spark.sql.functions.lit(" nearly duplicate suffix")).as("text")))
    val pairs = graft.operators.DedupSuite.minhashNearDups(
      corpus, "doc_id", "text", n = 3, k = 16, bands = 4, threshold = 0.5)
    val comp = Dedup.connectedComponents(pairs.select($"id_a", $"id_b"))
      .as[(Long, Long)].collect().toMap
    val check = pairs.select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(check.nonEmpty)
    check.foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"pair ($a, $b) split across components")
    }
  }
}
