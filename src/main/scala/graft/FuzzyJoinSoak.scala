package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** PassJoin edit-distance join (q78) at volume: n strings (default
  * 5 M) in groups of four — a base 24-char string from xxhash64, its
  * planted dist-1 twin ('z' substituted at position 7; 'z' is outside
  * the hex alphabet, so the distance is exactly 1), its planted
  * dist-2 twin ('z' at 3 and 'q' at 15 — same length with Hamming 2,
  * so levenshtein is exactly 2), and an unrelated string of varying
  * length (20–27 chars, exercising the ±d length window). Every
  * 400th group is a BOILERPLATE cohort sharing a fixed 12-char
  * prefix — the shared-segment hot bucket that is this operator's
  * adversarial input (seg0 of every cohort member is identical, so
  * the candidate join pays |cohort| × ~(2d+1)·|cohort| occurrences
  * for that key, pruned only by the pipelined bounded verify).
  *
  * Invariants (all exact, no tolerances):
  *  1. recall — every planted dist-1 and dist-2 pair is found with
  *     its exact distance (nGroups of each);
  *  2. determinism — two runs produce identical (count, checksum);
  *  3. economics recorded — candidate occurrences vs the n(n−1)/2
  *     naive pair count, and the hottest segment bucket size.
  *
  * Honest scale note (measured, see NOTES_r8): away from the hot
  * cohort the candidate ratio is ~0 (hash strings share no segments);
  * the hot cohort's cost grows as ~5·m² verify calls for cohort size
  * m — the operator's contract is that segments carry identity
  * signal, and a corpus where millions of records share a segment
  * (mass boilerplate) should be exact-prefix-deduped (d1/d11) before
  * fuzzy matching, exactly as a stopword is excluded from a keyword
  * index. Deterministic: strings derive from xxhash64 of the group
  * id — no RNG anywhere.
  */
object FuzzyJoinSoak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nGroups = n / 4
    val d = 2
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val gid = floor(col("id") / 4).cast("long")
    val role = pmod(col("id"), lit(4))
    def h(seed: Int) = lpad(hex(xxhash64(gid, lit(seed))), 16, "0")
    val hash32 = concat(h(1), h(2))
    val hot = gid % 400 === 7
    val base = when(hot,
      concat(lit("BOILERPLATEX"), substring(hash32, 13, 12)))
      .otherwise(substring(hash32, 1, 24))
    val mut1 = concat(substring(base, 1, 6), lit("z"), substring(base, 8, 17))
    val mut2 = concat(substring(base, 1, 2), lit("z"), substring(base, 4, 11),
      lit("q"), substring(base, 16, 9))
    val other = substring(concat(h(3), h(4)), lit(1),
      (lit(20) + pmod(gid, lit(8))).cast("int"))
    val s = when(role === 0, base).when(role === 1, mut1)
      .when(role === 2, mut2).otherwise(other)
    val recs = spark.range(n).select(col("id"), s.as("s"))

    recs.count() // warm codegen so run timings compare like-for-like

    def run() = {
      val pairs = FuzzyJoin.editDistancePairs(recs, "id", "s", d)
      val agg = pairs.agg(
        count(lit(1)).cast("bigint").as("pairs"),
        coalesce(sum(hash(col("id_a"), col("id_b"), col("dist"))
          .cast("bigint")), lit(0L)).as("checksum"),
        coalesce(sum(when(col("id_a") % 4 === 0 &&
          col("id_b") === col("id_a") + 1 && col("dist") === 1, 1L)
          .otherwise(0L)), lit(0L)).as("planted1"),
        coalesce(sum(when(col("id_a") % 4 === 0 &&
          col("id_b") === col("id_a") + 2 && col("dist") === 2, 1L)
          .otherwise(0L)), lit(0L)).as("planted2")).head()
      (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
    }

    val (r1, t1) = time(run())
    val (r2, t2) = time(run())
    require(r1 == r2, s"not deterministic across runs: $r1 vs $r2")
    require(r1._3 == nGroups,
      s"planted dist-1 recall: found ${r1._3} of $nGroups")
    require(r1._4 == nGroups,
      s"planted dist-2 recall: found ${r1._4} of $nGroups")

    // Economics in one extra pass: candidate occurrences (the join's
    // real fan-out, before the pipelined verify) and the hottest join
    // key's occurrence count (|index|·|probe| for the boilerplate
    // cohort's shared segment — the m² cost center).
    val ((candOcc, hottest), tCand) = time {
      val row = FuzzyJoin.segmentJoin(recs, "id", "s", d)
        .groupBy("ilen", "seg_idx", "seg")
        .agg(count(lit(1)).cast("bigint").as("occ"))
        .agg(coalesce(sum(col("occ")), lit(0L)).as("total"),
          coalesce(max(col("occ")), lit(0L)).as("hot")).head()
      (row.getLong(0), row.getLong(1))
    }
    val naivePairs = BigDecimal(n) * BigDecimal(n - 1) / 2

    println(s"""{"strings":$n,"groups":$nGroups,"d":$d,""" +
      s""""pairs":${r1._1},"planted1":${r1._3},"planted2":${r1._4},""" +
      s""""cand_occurrences":$candOcc,"naive_pairs":$naivePairs,""" +
      s""""cand_ratio":${(BigDecimal(candOcc) / naivePairs).toDouble},""" +
      s""""hottest_seg_bucket":$hottest,""" +
      s""""sec":{"run1":$t1,"run2":$t2,"cand_count":$tCand}}""")
    spark.stop()
  }
}
