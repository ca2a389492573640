package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-field entity resolution — exact weighted-score record pairs
  * WITHOUT the all-pairs compare. Extension operator (SURVEY §7.1):
  * generalizes [[FuzzyJoin.editDistancePairs]] from one string column
  * to N typed fields. Reference motivation: the merge's exact-id
  * identity assumption (`/root/reference/sql/load/03_merge.sql:26-27`)
  * — corpus-scale entities (author records, source records, near-dup
  * page metadata) have no shared key, so identity must be SCORED
  * across several noisy fields.
  *
  * Match rule: score(a,b) = Σ_f w_f · s_f(a,b) ≥ minScore, where for
  * a fuzzy field (maxDist ≥ 1) s_f = 1 − dist_f/(maxDist_f+1) when
  * dist_f ≤ maxDist_f else 0, and for an exact field (maxDist = 0)
  * s_f = 1 on equality else 0. Nulls score 0 (never match, including
  * null = null). The score is a fixed-order sum of doubles derived
  * from integer distances, so an external engine evaluating the same
  * expression reproduces it bit-for-bit — no tolerance needed.
  *
  * Blocking completeness: any pair with score ≥ minScore > 0 (weights
  * are required positive) has at least one field with s_f > 0 — i.e.
  * an exact field equal, or a fuzzy field within maxDist_f. The
  * per-field candidate generators are each complete for exactly that
  * predicate (hash join on value; PassJoin segment join for ≤ d — see
  * [[FuzzyJoin.segmentJoin]]), so the UNION of per-field candidates
  * is a complete superset and the verify only prunes.
  *
  * 100-TB design: one hash join (exact fields) or segment hash join
  * (fuzzy fields) per field, a partial-aggregable distinct over the
  * unioned id pairs, and two hash join-backs to fetch both sides'
  * fields for the verify — no window over records, no driver state,
  * no cross join. The verify uses the bounded 3-arg levenshtein
  * (O(d·|s|) per candidate). Hot blocking keys (a shared default
  * value in an exact field, a boilerplate prefix in a fuzzy field)
  * behave like any hot join key — AQE skew splitting applies; a
  * too-common exact value should be weighted/excluded by the caller
  * the way stopwords are (it carries no identity signal AND explodes
  * its bucket).
  */
object EntityResolution {

  /** One scoring field: `name` is the column, `maxDist` ≥ 1 makes it
    * fuzzy (levenshtein tolerance), 0 makes it exact-match;
    * `weight` > 0 is its score contribution at perfect similarity. */
  final case class ErField(name: String, maxDist: Int, weight: Double)

  /** Exact scored pairs (id_a, id_b, score) with id_a < id_b and
    * score ≥ minScore over the fields' weighted similarity sum. */
  def entityPairs(df: DataFrame, idCol: String, fields: Seq[ErField],
                  minScore: Double): DataFrame = {
    require(fields.nonEmpty, "need at least one field")
    require(fields.forall(_.weight > 0), "weights must be positive")
    require(fields.forall(_.maxDist >= 0), "maxDist must be >= 0")
    require(minScore > 0,
      "minScore must be > 0 (score-0 pairs are unblocked by design)")

    // Per-field candidate id pairs, unioned + deduped. Exact fields
    // block on the value itself; fuzzy fields on PassJoin segments.
    val candidates = fields.map { f =>
      if (f.maxDist == 0)
        df.select(col(idCol).as("id_a"), col(f.name).as("_v"))
          .filter(col("_v").isNotNull)
          .join(df.select(col(idCol).as("id_b"), col(f.name).as("_v")),
            Seq("_v"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
      else
        FuzzyJoin.candidatePairs(df, idCol, f.name, f.maxDist)
    }.reduce(_.unionByName(_)).distinct()

    // Verify: fetch both sides' fields (two hash join-backs, candidate-
    // bounded fan-out) and evaluate the fixed-order weighted sum.
    val aSide = df.select(col(idCol).as("id_a") +:
      fields.map(f => col(f.name).as(s"_a_${f.name}")): _*)
    val bSide = df.select(col(idCol).as("id_b") +:
      fields.map(f => col(f.name).as(s"_b_${f.name}")): _*)
    val score: Column = fields.map { f =>
      val (a, b) = (col(s"_a_${f.name}"), col(s"_b_${f.name}"))
      if (f.maxDist == 0)
        when(a.isNotNull && a === b, lit(f.weight)).otherwise(lit(0.0))
      else {
        val dist = levenshtein(a, b, f.maxDist)
        when(dist >= 0,
          lit(f.weight) * (lit(1.0) -
            dist.cast("double") / lit((f.maxDist + 1).toDouble)))
          .otherwise(lit(0.0))
      }
    }.reduce(_ + _)
    candidates.join(aSide, "id_a").join(bSide, "id_b")
      .withColumn("score", score)
      .filter(col("score") >= minScore)
      .select(col("id_a"), col("id_b"), col("score"))
  }
}
