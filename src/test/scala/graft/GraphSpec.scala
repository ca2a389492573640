package graft

import graft.operators.Graph

/** Integer-exact PageRank vs a driver-side reference implementation of
  * the same BIGINT recurrence. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference recurrence on a Scala Map — same integer semantics. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          scale: Long = 1000000000000L): Map[Long, Long] = {
    val outd = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val base = 15L * scale / 100L
    var r = nodes.map(_ -> scale).toMap
    (1 to iters).foreach { _ =>
      val m = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / outd(s) }.sum
      }
      r = nodes.map(n => n -> (base + 85L * m.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  test("asymmetric graph with a dangling node matches the reference recurrence") {
    // star into 1, chain out of 1, node 5 dangling (in-edges only)
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L), (2L, 3L),
      (3L, 5L), (4L, 5L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == refPageRank(edges, 4))
  }

  test("regular symmetric graphs are an exact fixed point of the recurrence") {
    // K5 symmetrized: outdeg 4 everywhere; 4 | scale and 100 | 85*scale,
    // so every division is exact and rank stays exactly `scale` — a
    // closed-form invariant that would catch any off-by-one in the
    // div/damping order (K4's outdeg 3 does NOT divide 1e12: the
    // recurrence correctly sheds one unit per node there)
    val nodes = 0L until 5L
    val edges = (for { a <- nodes; b <- nodes if a != b } yield (a, b)).toSeq
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == nodes.map(_ -> 1000000000000L).toMap)
    assert(got == refPageRank(edges, 3))
  }

  test("ranks are identical across shuffle parallelism (BIGINT associativity)") {
    val edges = (0L until 200L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 200L), (i, (i * 13 + 11) % 200L))).distinct
    val df = edges.toDF("src", "dst")
    val ref = refPageRank(edges, 3)
    Seq("1", "8").foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      try {
        val got = Graph.pageRank(df, "src", "dst", iters = 3)
          .as[(Long, Long)].collect().toMap
        assert(got == ref, s"divergence at shuffle.partitions=$p")
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }
}
