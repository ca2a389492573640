package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph scoring operators.
  *
  * Corpus-curation pipelines score documents/hosts by graph centrality
  * (the CommonCrawl-derived corpora gate on link-graph signals before
  * text-quality filters ever run), and the reference's relational
  * surface has no graph operator family at all — this is extension
  * surface in the spirit of `Dedup.connectedComponents`, its sibling
  * iterative-graph shape.
  *
  * All arithmetic is INTEGER-EXACT (the d17/q78 discipline): ranks are
  * BIGINT in units of `scale`, damping is applied as `(85 * x) div
  * 100`, and per-node contribution is `rank div out_degree` with
  * truncating (= floor, all values non-negative) division. Exactness
  * buys two things: the DuckDB oracle can replicate the recurrence
  * bit-for-bit with no float-sum-order hazard, and the 1x/8x
  * parallelism sweep is trivially deterministic because BIGINT
  * addition is associative — a double-summed PageRank is neither.
  */
object Graph {

  /** Damped PageRank over a directed edge list, `iters` fixed
    * synchronous iterations, integer-exact.
    *
    * Recurrence (all BIGINT):
    * {{{
    *   r_0(v)     = scale
    *   r_{t+1}(v) = (15*scale) div 100
    *                + (85 * sum_{u->v} (r_t(u) div outdeg(u))) div 100
    * }}}
    * The node set is src ∪ dst of `edges` (assumed pre-deduplicated).
    * Dangling nodes (no out-edges) receive rank but contribute none —
    * their mass decays rather than being redistributed, the standard
    * "lost mass" simplification; callers wanting the probability-
    * normalized variant symmetrize the edge list (as q82 does), which
    * removes dangling nodes by construction.
    *
    * Scale shape: `edges ⋈ outdeg` is precomputed ONCE and persisted
    * with the contribution divisor attached — the loop's per-iteration
    * work is exactly one shuffle (ranks hash-join edges on src — both
    * sides partitioned by the same key after round 1, so AQE reuses
    * the exchange) plus one partial-aggregable BIGINT sum keyed by
    * dst. Rank state is O(|V|) rows of 16 bytes; lineage is truncated
    * by localCheckpoint each round (the connectedComponents idiom at
    * `Dedup.scala:99`). At 100 TB the edge list is the big side and it
    * never re-materializes after the first iteration.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    val (contribEdges, nodes, ranks0) = pageRankSetup(edges, srcCol, dstCol, scale)
    var ranks = ranks0
    var t = 0
    while (t < iters) {
      ranks = pageRankStep(contribEdges, nodes, ranks, scale).localCheckpoint()
      t += 1
    }
    contribEdges.unpersist(blocking = false)
    ranks
  }

  /** The loop inputs of [[pageRank]]: `(contribEdges, nodes, ranks0)`
    * — the persisted edge list with its contribution divisor attached,
    * the checkpointed node set, and the checkpointed uniform initial
    * ranks. Exposed (with [[pageRankStep]]) so plan evidence —
    * GraphSpec's exchange-count assertion, PlanDump's q82 iteration
    * entry — inspects EXACTLY the plan the production loop runs, not a
    * reconstruction. */
  def pageRankSetup(edges: DataFrame, srcCol: String, dstCol: String,
                    scale: Long = 1000000000000L): (DataFrame, DataFrame, DataFrame) = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("bigint").as("outd"))
    // the loop's only big join input: edge list with the divisor
    // pre-attached, persisted so iterations 2..n reread a materialized
    // shuffle-friendly cache instead of re-running the upstream plan
    val contribEdges = e.join(outdeg, Seq("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node_id"))
      .unionByName(e.select(col("dst").as("node_id")))
      .distinct()
      .localCheckpoint()
    (contribEdges, nodes,
      nodes.select(col("node_id"), lit(scale).as("pr")).localCheckpoint())
  }

  /** ONE synchronous iteration of the recurrence, as an UNCHECKPOINTED
    * plan over the loop state — the exact loop body of [[pageRank]].
    *
    * The per-iteration shape that must hold at any scale — pinned by
    * GraphSpec ("loop body plans exactly one shuffle") and PLANS.md's
    * q82 iteration entry: ONE hash exchange total, the contribution
    * sum's, fed by a map-side partial `sum`; the edge side joins from
    * the persisted cache and is never re-shuffled (ranks is the small
    * O(|V|) side — broadcast locally, co-partitioned SMJ at cluster
    * scale). Nodes with no in-edges are handled by UNIONING a zero
    * contribution row per node into the aggregation, NOT by a second
    * join back to the node set: `sum(0 ∪ contribs) = sum(contribs)`
    * bit-exactly in BIGINT, every node is guaranteed a group, and the
    * join-back's own rank-sized exchange (the checkpointed ranks scan
    * has unknown partitioning, so the join could never reuse one)
    * disappears — measured, that removed 1 of 2 per-iteration
    * exchanges without changing a single output bit.
    *
    * `a DIV b`, NOT `a / b`: Spark's `/` on BIGINT routes through
    * DOUBLE, whose 53-bit mantissa mis-floors quotients once the
    * damped sums pass 2^53 (~9e15 — reachable at graph sizes this
    * targets). DIV is true integral division, exact at any magnitude. */
  def pageRankStep(contribEdges: DataFrame, nodes: DataFrame, ranks: DataFrame,
                   scale: Long = 1000000000000L): DataFrame = {
    val contribs = contribEdges
      .join(ranks.withColumnRenamed("node_id", "src"), Seq("src"))
      .select(col("dst").as("node_id"),
        expr("pr div outd").as("c"))
    nodes.select(col("node_id"), lit(0L).as("c"))
      .unionByName(contribs)
      .groupBy(col("node_id"))
      .agg(sum(col("c")).as("m"))
      .select(col("node_id"),
        (lit(15L * scale / 100L) + expr("(85 * m) div 100")).as("pr"))
  }
}
