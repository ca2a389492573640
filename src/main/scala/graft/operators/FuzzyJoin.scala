package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join (fuzzy matching / entity resolution) —
  * exact pairs with levenshtein ≤ d, WITHOUT the all-pairs compare.
  * Extension operator (SURVEY §7.1): the string-metric member of the
  * dedup family (exact d1, Jaccard d4, cosine d17), and the engine
  * form of the reference's keyed-identity assumption (`03_merge.sql`
  * merges on exact ids; real-world corpora need a tolerant key).
  *
  * Algorithm: PassJoin-style segment blocking (Li, Deng, Wang, Feng,
  * "PASS-JOIN: A Partition-based Method for Similarity Joins",
  * VLDB'12 — see PAPERS.md). Each string of length L is partitioned
  * into d+1 near-even segments; by pigeonhole, any partner within
  * edit distance d leaves ≥ 1 segment untouched, and that segment
  * occurs in the partner shifted by at most d positions (edits before
  * it shift it by ≤ d) with total length differing by at most d. So:
  * the INDEX side emits d+1 (L, segIdx, segment) keys per string; the
  * PROBE side emits, for each claimed indexed length L' = len ± δ
  * (|δ| ≤ d) and segment index i, the substrings at positions within
  * ± d of that segment's nominal start — a CONSTANT ≤ (2d+1)²(d+1)
  * keys per record after dedup, independent of string length. The
  * hash join on (L', segIdx, segment) yields a complete candidate
  * superset; an exact `levenshtein` verify (same unit-cost definition
  * in Spark and DuckDB, so the oracle reproduces distances
  * bit-for-bit) keeps true pairs only.
  *
  * 100-TB design: candidate generation is one hash join on composite
  * string keys with constant per-record fan-out — no length-bucket
  * cross joins, no windows, no driver state; the candidate pair set
  * is deduped by a partial-aggregable groupBy before the verify
  * joins. Hot segments (a common prefix shared by millions of
  * records) behave like any hot join key — AQE skew splitting
  * applies; the verify is O(d·|s|) per candidate via the banded
  * levenshtein, and candidates with |len_a − len_b| > d never form
  * (the length is part of the join key).
  */
object FuzzyJoin {

  /** PassJoin segment-blocked candidate join over `df`'s (idCol,
    * strCol): one row per candidate OCCURRENCE (not yet deduped) with
    * columns (iid, pid, _sa, _sb, _la, _lb), keeping only the
    * orientation where the indexed side is shorter (or smaller-id at
    * equal length) — the pigeonhole guarantee holds in both
    * orientations, so this halves occurrences without losing a pair.
    * Complete for levenshtein ≤ d: every qualifying pair appears at
    * least once. Shared by [[editDistancePairs]] (verify pipelined
    * in-join) and [[EntityResolution]] (per-field candidate sets). */
  private[graft] def segmentJoin(df: DataFrame, idCol: String,
                                 strCol: String, d: Int): DataFrame = {
    require(d >= 1 && d <= 4, "supported maxDist: 1..4")
    val nSeg = d + 1
    val recs = df.select(col(idCol).as("id"), col(strCol).as("s"),
      length(col(strCol)).as("len"))

    // Near-even partition of length L: base = L/(d+1), rem = L%(d+1);
    // segment i has length base+1 for i<rem else base, and 1-based
    // start i*base + min(i, rem) + 1.
    def segLen(lenC: Column, i: Int): Column = {
      val base = floor(lenC / nSeg).cast("int")
      val rem = pmod(lenC, lit(nSeg)).cast("int")
      base + when(lit(i) < rem, 1).otherwise(0)
    }
    def segStart(lenC: Column, i: Int): Column = {
      val base = floor(lenC / nSeg).cast("int")
      val rem = pmod(lenC, lit(nSeg)).cast("int")
      lit(i) * base + least(lit(i), rem) + 1
    }

    // Index side: d+1 segment keys per record. The record's string
    // rides along (short by contract — titles/names/keys), so the
    // verify can run INSIDE the candidate join stage instead of
    // re-joining the corpus twice afterwards.
    val indexSide = recs.select(col("id").as("iid"), col("s").as("_sa"),
      col("len").as("_la"), explode(array(
        (0 until nSeg).map { i =>
          struct(col("len").as("ilen"), lit(i).as("seg_idx"),
            col("s").substr(segStart(col("len"), i), segLen(col("len"), i))
              .as("seg"))
        }: _*)).as("k"))
      .select(col("iid"), col("_sa"), col("_la"),
        col("k.ilen"), col("k.seg_idx"), col("k.seg"))

    // Probe side: for each claimed indexed length len+δ, segment i,
    // and start shift j, the substring the pigeonhole argument says a
    // ≤ d partner must contain. The (δ, i, j) combinations come from
    // a broadcast literal table rather than a (2d+1)²(d+1)-element
    // expression array: the fan-out is identical, but each output row
    // evaluates ONE small substring expression instead of the row
    // evaluating all 75 — a 75-struct CreateArray blows the generated
    // method past codegen limits and the whole stage falls back to
    // interpreted eval (measured at ~2× the query's total runtime).
    // Duplicate keys from distinct (δ, j) combos are not deduped:
    // the final pair groupBy absorbs them.
    import df.sparkSession.implicits._
    val combos = (for {
      delta <- -d to d
      i <- 0 until nSeg
      j <- -d to d
    } yield (delta, i, j)).toDF("_delta", "seg_idx", "_j")
    val ilen = col("len") + col("_delta")
    val pBase = floor(ilen / nSeg).cast("int")
    val pRem = pmod(ilen, lit(nSeg)).cast("int")
    val pLen = pBase + when(col("seg_idx") < pRem, 1).otherwise(0)
    val pStart = col("seg_idx") * pBase + least(col("seg_idx"), pRem) +
      1 + col("_j")
    val probeSide = recs.join(broadcast(combos))
      .filter(ilen >= 0 && pLen >= 0 && pStart >= 1 &&
        pStart + pLen - lit(1) <= col("len"))
      .select(col("id").as("pid"), col("s").as("_sb"),
        col("len").as("_lb"), ilen.cast("int").as("ilen"),
        col("seg_idx"), col("s").substr(pStart, pLen).as("seg"))

    indexSide
      .join(probeSide, Seq("ilen", "seg_idx", "seg"))
      .filter(col("_la") < col("_lb") ||
        (col("_la") === col("_lb") && col("iid") < col("pid")))
  }

  /** Exact pairs (id_a, id_b, dist) with levenshtein(s_a, s_b) ≤
    * maxDist and id_a < id_b, over `strCol` of `df`. The verify is
    * PIPELINED into the candidate join stage: levenshtein (unit-cost
    * in both this engine and the DuckDB oracle) filters before
    * anything shuffles, and one partial-aggregable groupBy collapses
    * the per-segment duplicate occurrences of each surviving pair
    * (dist is pair-constant, min() is just the deterministic pick). */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int): DataFrame =
    segmentJoin(df, idCol, strCol, maxDist)
      // 3-arg bounded levenshtein: the DP early-exits once the band
      // exceeds d (O(d·|s|) per candidate, not O(|s|²)) and returns -1
      // over threshold — so the keep-filter is dist >= 0, and [0, d]
      // distances are bit-identical to the unbounded form the oracle
      // computes. Immaterial at 24-char gate strings; the win is real
      // on long-string corpora (FuzzyJoinSpec's 2k-char case).
      .withColumn("dist",
        levenshtein(col("_sa"), col("_sb"), maxDist).cast("int"))
      .filter(col("dist") >= 0)
      .select(least(col("iid"), col("pid")).as("id_a"),
        greatest(col("iid"), col("pid")).as("id_b"), col("dist"))
      .groupBy("id_a", "id_b").agg(min(col("dist")).cast("int").as("dist"))

  /** Deduped candidate PAIRS (id_a < id_b) whose `strCol` values MAY
    * be within edit distance d — the blocking half of
    * [[editDistancePairs]] without the verify, for callers (entity
    * resolution) that verify a multi-field score instead. Complete:
    * contains every pair with levenshtein ≤ d; Catalyst prunes the
    * ridden-along strings before the distinct's shuffle. */
  def candidatePairs(df: DataFrame, idCol: String, strCol: String,
                     maxDist: Int): DataFrame =
    segmentJoin(df, idCol, strCol, maxDist)
      .select(least(col("iid"), col("pid")).as("id_a"),
        greatest(col("iid"), col("pid")).as("id_b"))
      .distinct()
}
