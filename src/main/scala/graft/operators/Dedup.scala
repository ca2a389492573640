package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication — SURVEY §2.D.
  *
  * Spark's `dropDuplicates` keeps an *arbitrary* row per key; the
  * reference's semantics are positional (`keep="last"`,
  * `/root/reference/src/transform/hn_transform.py:109-116`) or versioned
  * (keep max `extracted_at`, `/root/reference/sql/load/03_merge.sql:27`).
  * Both are a single `row_number` window — one shuffle on the key, no
  * sort of the whole input, partial-agg-free but hash-partition-able, so
  * the plan is a straight exchange+sort-within-partition at any scale.
  * Skewed keys (one id with millions of dups) are the failure mode at
  * 100 TB; AQE skew handling does not split windows, so extremely hot
  * keys would need a pre-aggregation — not reachable for PK-style dedup
  * where dup counts are small by construction.
  */
object Dedup {

  /** D1 — keep the LAST occurrence per key under an explicit ordering
    * column (input position, batch index, …). Ties broken arbitrarily
    * only if `order` itself ties — pass a total order for determinism. */
  def keepLast(df: DataFrame, keys: Seq[String], order: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** D2 — keep the newest version per key (max `versionCol`), with
    * `tieBreak` deciding equal versions (the reference keeps the target
    * row on ties: `s.extracted_at > t.extracted_at` is strict). */
  def keepNewest(df: DataFrame, keys: Seq[String], versionCol: Column,
                 tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(versionCol.desc, tieBreak.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Connected components over an undirected pair list
    * (`id_a`, `id_b`) by iterative min-label propagation — the operator
    * that turns near-dup PAIRS into dedup CLUSTERS. Each iteration
    * joins every node's current label against its neighbors' and keeps
    * the minimum; converged when no label changes. Iterations are
    * O(diameter) — near-dup clusters are shallow (dups of dups of one
    * source), so 3-5 rounds cover real corpora; `maxIter` bounds
    * adversarial chains. Each round is two shuffles (join + agg) on the
    * edge list; at 100 TB the edge list is the small output of LSH, not
    * the corpus. Returns (id, component) where component = min id
    * reachable within maxIter hops. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10,
                          localThreshold: Long = 100000L): DataFrame = {
    // small-graph fast path: the LSH pair list is usually a tiny
    // fraction of the corpus — when it fits on the driver, a union-find
    // beats 2 Spark jobs per distributed round by orders of magnitude
    // (the same economics as broadcasting a small join side). ONE job
    // decides AND fetches: limit(threshold+1) + collect — if the limit
    // wasn't hit we hold the whole pair list. Union-find needs neither
    // the symmetric closure nor distinct edges, so the raw pair list is
    // collected as-is (an uncached count()-then-collect() ran the
    // upstream pair pipeline twice; at sf0.1 that was ~half of d8).
    val spark = pairs.sparkSession
    locally {
      import spark.implicits._
      // clamp before toInt: a Long threshold near Int.MaxValue would
      // wrap to a negative limit (AnalysisException) — ADVICE.md r3
      val lim = math.min(localThreshold, Int.MaxValue - 1L).toInt + 1
      val sample = pairs
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        .limit(lim)
        .as[(Long, Long)].collect()
      if (sample.length <= localThreshold) {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != r) {
            val next = parent.getOrElse(c, c); parent(c) = r; c = next
          }
          r
        }
        sample.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // union by MIN root → component label = min id
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        return parent.keys.toSeq.sorted.map(id => (id, find(id)))
          .toDF("id", "component")
      }
    }
    // every iteration joins against `edges`: persist it or the entire
    // upstream pair pipeline (minhash/LSH at corpus scale) re-executes
    // once per round — measured on the soak corpus, this turned an
    // O(pipeline × iters) loop into pipeline + O(|edges| × iters)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed with min(self, direct neighbors): one aggregation over the
    // (already symmetric) edge list gives every node its round-1 label
    // for free — star/pair clusters (the common near-dup shape) start
    // fully converged, and chain depth shrinks by one before the loop
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(col("id"), min(col("dst"))).as("component"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor labels: for each edge (src, dst), dst's label proposes
      // itself to src; keep min(own, proposals). `prev` rides along so
      // the convergence check below is a scan of the checkpointed
      // result, not a join against the previous round
      val proposals = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("prop"))
      val propagated = labels.join(proposals, Seq("id"), "left")
        .select(col("id"), col("component").as("prev"),
          least(col("component"), coalesce(col("prop"), col("component")))
            .as("component"))
      // pointer jumping: follow the label's OWN label (components are
      // node ids, so every label is a key in the table). This squares
      // the propagation distance per round — a depth-d chain converges
      // in O(log d) rounds instead of d, which is what makes a fixed
      // maxIter safe for deep components
      val next = propagated
        .join(propagated.select(col("id").as("component"),
          col("component").as("__c2")), Seq("component"), "left")
        .select(col("id"), col("prev"),
          least(col("component"), coalesce(col("__c2"), col("component")))
            .as("component"))
        .localCheckpoint() // truncate the growing iterative lineage
      converged = next.filter(col("component") =!= col("prev")).isEmpty
      labels = next.select(col("id"), col("component"))
      iter += 1
    }
    // labels is localCheckpoint'ed (materialized) every round, so the
    // edge cache is safe to release eagerly here
    edges.unpersist(blocking = false)
    labels
  }

  /** Fold a batch of NEW pairs into an existing component labeling
    * WITHOUT rescanning the old pair/edge list — the ingest twin of
    * [[connectedComponents]] (the d13/d18/d19/e10/q90/q91 incremental
    * discipline, applied to the last remaining iterative family).
    *
    * Why no corpus rescan is needed: a new edge (u, v) can only merge
    * the COMPONENTS containing u and v, so the batch maps through the
    * current labels into a component-level edge list (≤ |batch| rows),
    * the full CC machinery runs on THAT tiny graph, and the resulting
    * old-component → merged-component mapping relabels the O(V) label
    * store. Cost: O(batch) + O(labels) — independent of the edge list,
    * which at 100 TB is the thing you cannot afford to re-walk.
    *
    * Exactness: `labels` must be a [[connectedComponents]] output
    * (component = min member id — canonical). The component graph's
    * min-label CC then yields merged labels that are again min member
    * ids, so the fold is BIT-identical to a full recompute over
    * oldPairs ∪ batch — which is the d22 gate. Batch nodes absent
    * from `labels` enter self-labeled first (a node unseen by any old
    * pair is its own component, exactly as the full recompute would
    * label it). */
  def foldComponents(labels: DataFrame, batch: DataFrame,
                     maxIter: Int = 10,
                     localThreshold: Long = 100000L): DataFrame = {
    val l = labels.select(col("id").cast("long").as("id"),
      col("component").cast("long").as("component"))
    val b = batch.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b"))
    val batchNodes = b.select(col("id_a").as("id"))
      .unionByName(b.select(col("id_b").as("id"))).distinct()
    val all = l.unionByName(
      batchNodes.join(l, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("component")))
    // component-level edges: only pairs BRIDGING two components matter
    val compEdges = b
      .join(all.select(col("id").as("id_a"), col("component").as("ca")),
        "id_a")
      .join(all.select(col("id").as("id_b"), col("component").as("cb")),
        "id_b")
      .select(col("ca").as("id_a"), col("cb").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    val mapping = connectedComponents(compEdges, maxIter, localThreshold)
      .toDF("component", "merged")
    all.join(mapping, Seq("component"), "left")
      .select(col("id"),
        coalesce(col("merged"), col("component")).as("component"))
  }
}
