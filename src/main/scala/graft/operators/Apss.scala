package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** All-pairs similarity search (APSS) over sparse term-frequency
  * vectors — exact cosine pairs above a threshold, WITHOUT the naive
  * all-pairs join. Extension operator (SURVEY §7.1): the sparse-text
  * sibling of the dense-embedding near-dup path in [[Similarity]].
  *
  * Algorithm: inverted-index candidate generation with prefix
  * filtering in the Bayardo all-pairs family ("Scaling Up All Pairs
  * Similarity Search", WWW'07), tightened with the ℓ²-norm indexing
  * bound of L2AP (Anastasiu & Karypis, ICDE'14) — see PAPERS.md.
  * Terms get a global order (document frequency descending, so the
  * most frequent terms come first); each document skips indexing its
  * leading terms while BOTH prefix bounds stay below τ:
  * `Σ w(d,t)·maxw(t)` (Bayardo) and `‖w(d)|prefix‖₂` (L2AP — any
  * partner's dot with the prefix is ≤ its ℓ² norm by Cauchy–Schwarz,
  * the partner being unit-norm). Any pair with cos ≥ τ must then
  * share at least one INDEXED term of EACH side, so joining the
  * pruned index of the smaller-id side against full postings loses no
  * true pair. The candidate aggregation accumulates the EXACT unit-
  * weight mass and integer dot of the shared indexed terms plus the
  * partner's shared squared mass; `cos(a,b) ≤ shared_mass +
  * min(pb(a), prefnorm(a)·√(1−sb))` then kills candidates that
  * provably cannot reach τ before any completion work happens.
  *
  * Verification is integer-exact so an external oracle reproduces it
  * bit-for-bit: with integer tf counts, `cos(a,b) ≥ p/q  ⟺
  * q²·dot² ≥ p²·‖a‖²·‖b‖²` and all four quantities are BIGINTs
  * (dot ≥ 0 because tf ≥ 0, so squaring preserves the inequality).
  * The exact dot = shared-indexed dot (from the candidate agg) +
  * a completion join over ONLY the unindexed prefix postings of the
  * indexed side. Floating point appears only in the PRUNING bounds,
  * each with a safety margin (1e−6) that makes rounding err only
  * toward keeping more candidates — never toward dropping a pair.
  *
  * 100-TB design: every stage is a hash join or partial-aggregable
  * hash aggregate — no per-pair map lookups, no driver-side state,
  * nothing broadcast by construction (AQE may still broadcast the
  * vocabulary-sized stats frame and the prefix postings when small).
  * The only window is the per-doc prefix scan, whose partitions are
  * doc-length bounded. The candidate join's fan-out is bounded by the
  * pruned index — on Zipfian text the frequent terms (exactly the
  * postings lists that explode the naive join) are the first skipped.
  * Note the synthetic gate corpus is the adversarial OPPOSITE (31-term
  * vocabulary, df ≈ 0.8·|docs| for every term, so EVERY doc pair
  * shares indexed terms and pairwise cosines cluster just under τ):
  * no exact algorithm beats Θ(|pairs|) there. The d17 gate therefore
  * runs on a deterministic bounded slice of documents — the same
  * gate-bounding discipline as q36/q67 — while the operator keeps the
  * shape that scales on real text.
  */
object Apss {

  /** Prune slack: float rounding errs toward keeping candidates,
    * never toward dropping a true pair. */
  private val Margin = 1e-6

  /** Per-(doc, term) integer term frequencies of the tokenized text.
    * Exposed for [[graft.ApssSoak]]'s independent accounting. */
  private[graft] def termFreqs(docs: DataFrame, idCol: String,
                               textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).cast("bigint").as("tf"))

  /** Postings with prefix-filter flags: (id, term, tf, n2, w, df,
    * cum, pnorm, indexed). In (df desc, term) order a doc indexes a
    * term once min(Σ w·maxw, ‖prefix‖₂) crosses τ — the Bayardo
    * bound and the L2AP ℓ² bound respectively. The unindexed prefix
    * then bounds the similarity mass any partner could draw from it
    * by < τ, so every qualifying pair shares an indexed term of each
    * side. Every doc indexes ≥ 1 term (at its last term both bounds
    * reach ≥ Σw² = 1 ≥ τ). */
  private[graft] def flaggedPostings(docs: DataFrame, idCol: String,
                                     textCol: String, tauNum: Int,
                                     tauDen: Int): DataFrame = {
    val tau = tauNum.toDouble / tauDen
    val tf = termFreqs(docs, idCol, textCol)
    val n2 = tf.groupBy("id").agg(sum(col("tf") * col("tf")).as("n2"))
    val wtf = tf.join(n2, "id")
      .withColumn("w", col("tf").cast("double") / sqrt(col("n2").cast("double")))

    // Global term stats: max unit weight (the Bayardo prefix bound)
    // and df (the ordering key). Vocabulary-sized — NOT broadcast by
    // design; AQE may still choose broadcast when it is small.
    val stats = wtf.groupBy("term")
      .agg(max(col("w")).as("maxw"), count(lit(1)).as("df"))

    val order = Window.partitionBy("id")
      .orderBy(col("df").desc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtf.join(stats, "term")
      .withColumn("cum", sum(col("w") * col("maxw")).over(order))
      .withColumn("pnorm", sqrt(sum(col("w") * col("w")).over(order)))
      .withColumn("indexed",
        least(col("cum"), col("pnorm")) >= lit(tau - Margin))
  }

  /** Reusable open-world APSS index over a corpus, for incremental
    * batch-vs-corpus probing ([[incrementalPairs]], the d13 ingest
    * shape). Columns: (id, term, tf, n2, w, pnorm, indexed).
    *
    * The indexing decision here uses ONLY the ℓ²-prefix bound
    * (`pnorm ≥ τ`), NOT the Bayardo `Σ w·maxw` bound that
    * [[flaggedPostings]] also exploits: `maxw` is the max unit weight
    * seen IN THIS CORPUS, so a bound built from it is valid only
    * against partners drawn from the same corpus — a future batch
    * document may weight a term above the corpus max, and a
    * cum-justified skip would then silently drop a true pair. The ℓ²
    * bound is partner-independent (dot over the prefix ≤ ‖prefix‖₂
    * by Cauchy–Schwarz, any partner being unit-norm), so an index
    * flagged by it stays sound against ARBITRARY future batches.
    * pnorm-only indexing starts indexing no later than the
    * least(cum, pnorm) rule, so this index is a superset of the
    * closed-world one — the cost of open-world safety is candidates,
    * never recall. Term order stays (df desc, term): the corpus's
    * frequent terms are the first skipped, which is what keeps the
    * candidate join off the head postings lists.
    *
    * 100-TB design: built once per corpus epoch (every stage a hash
    * join / partial-agg, as [[cosinePairs]]), persisted columnar, and
    * reused across ingest batches — per-batch work is then bounded by
    * the batch's postings joined against the pruned index, not by a
    * corpus re-index.
    */
  def buildIndex(corpus: DataFrame, idCol: String, textCol: String,
                 tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, "need 0 < tau <= 1")
    val tau = tauNum.toDouble / tauDen
    val tf = termFreqs(corpus, idCol, textCol)
    val n2 = tf.groupBy("id").agg(sum(col("tf") * col("tf")).as("n2"))
    val wtf = tf.join(n2, "id")
      .withColumn("w", col("tf").cast("double") / sqrt(col("n2").cast("double")))
    val df = wtf.groupBy("term").agg(count(lit(1)).as("df"))
    val order = Window.partitionBy("id")
      .orderBy(col("df").desc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtf.join(df, "term")
      .withColumn("pnorm", sqrt(sum(col("w") * col("w")).over(order)))
      .withColumn("indexed", col("pnorm") >= lit(tau - Margin))
      .select("id", "term", "tf", "n2", "w", "pnorm", "indexed")
  }

  /** Incremental APSS: exact cosine pairs (corpus doc, batch doc)
    * with cos ≥ tauNum/tauDen, probing a persisted [[buildIndex]]
    * frame with a NEW batch — the corpus is never re-tokenized or
    * re-indexed. Output: (doc_a, doc_b, dot, na, nb) with doc_a from
    * the corpus and doc_b from the batch, integer-exact as
    * [[cosinePairs]]. Batch-internal pairs are [[cosinePairs]] on the
    * batch alone; `index` must have been built with the SAME τ (a
    * looser-τ index is also sound — more indexed terms, never fewer).
    *
    * Completeness: a qualifying pair must share an indexed term of
    * the CORPUS side — the corpus doc's unindexed prefix has
    * ‖prefix‖₂ < τ (the [[buildIndex]] flag), which bounds any
    * unit-norm partner's dot with it below τ. So joining batch
    * postings (unpruned — the batch side needs no prefix argument)
    * against the pruned index loses nothing. The candidate prune uses
    * only the partner-independent Cauchy–Schwarz residual
    * `prefnorm·√(1−sb)` — the corpus-relative Bayardo bound is
    * deliberately absent (see [[buildIndex]]).
    */
  def incrementalPairs(index: DataFrame, batch: DataFrame, idCol: String,
                       textCol: String, tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, "need 0 < tau <= 1")
    val tau = tauNum.toDouble / tauDen

    val btf = termFreqs(batch, idCol, textCol)
    val bn2 = btf.groupBy("id").agg(sum(col("tf") * col("tf")).as("n2"))
    val probe = btf.join(bn2, "id")
      .withColumn("pw", col("tf").cast("double") / sqrt(col("n2").cast("double")))
      .select(col("id").as("pid"), col("term"), col("pw"),
        col("tf").as("ptf"))

    val idx = index.filter(col("indexed"))
      .select(col("id"), col("term"), col("w"), col("tf"))
    val prefix = index.filter(!col("indexed"))
    val prefixUb = prefix.groupBy("id")
      .agg(sqrt(sum(col("w") * col("w"))).as("prefnorm"))

    val candidates = idx.join(probe, "term")
      .groupBy(col("id").as("doc_a"), col("pid").as("doc_b"))
      .agg(sum(col("w") * col("pw")).as("shared_mass"),
        sum(col("tf") * col("ptf")).as("sdot"),
        sum(col("pw") * col("pw")).as("sb"))
      .join(prefixUb.withColumnRenamed("id", "doc_a"), Seq("doc_a"), "left")
      .filter(col("shared_mass") +
        coalesce(col("prefnorm"), lit(0.0)) *
          sqrt(greatest(lit(0.0), lit(1.0) - col("sb"))) >=
        lit(tau - Margin))
      .select(col("doc_a"), col("doc_b"), col("sdot"))

    // Completion over the corpus side's unindexed prefix ∩ batch
    // terms — candidate-bounded fan-out, no corpus re-tokenization.
    val prefA = prefix.select(col("id").as("doc_a"), col("term"),
      col("tf").as("tfa"))
    val tb = btf.select(col("id").as("doc_b"), col("term"),
      col("tf").as("tfb"))
    val rdots = candidates.join(prefA, Seq("doc_a"))
      .join(tb, Seq("doc_b", "term"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("tfa") * col("tfb")).as("rdot"))
    val dots = candidates.join(rdots, Seq("doc_a", "doc_b"), "left")
      .withColumn("dot", col("sdot") + coalesce(col("rdot"), lit(0L)))

    val na = index.groupBy("id").agg(max(col("n2")).as("na"))
      .withColumnRenamed("id", "doc_a")
    val nb = bn2.select(col("id").as("doc_b"), col("n2").as("nb"))
    // Same decimal(38,0) exact threshold as cosinePairs.
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    dots.join(na, "doc_a").join(nb, "doc_b")
      .filter(d38(lit(tauDen.toLong * tauDen)) * d38(col("dot")) * d38(col("dot")) >=
        d38(lit(tauNum.toLong * tauNum)) * d38(col("na")) * d38(col("nb")))
      .select(col("doc_a"), col("doc_b"), col("dot"), col("na"), col("nb"))
  }

  /** Exact cosine-similar pairs with cos ≥ tauNum/tauDen over
    * whitespace-family tokens of `textCol`. Output:
    * (doc_a, doc_b, dot, na, nb) — all integer-exact, doc_a < doc_b.
    */
  def cosinePairs(docs: DataFrame, idCol: String, textCol: String,
                  tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, "need 0 < tau <= 1")
    val tau = tauNum.toDouble / tauDen
    val margin = Margin

    // All downstream branches reuse tf's exchange (same canonical
    // subplan), so the separate builds below don't re-scan.
    val tf = termFreqs(docs, idCol, textCol)
    val n2 = tf.groupBy("id").agg(sum(col("tf") * col("tf")).as("n2"))
    val wtf = tf.join(n2, "id")
      .withColumn("w", col("tf").cast("double") / sqrt(col("n2").cast("double")))

    val flagged = flaggedPostings(docs, idCol, textCol, tauNum, tauDen)
    val prefix = flagged.filter(!col("indexed"))

    // Per-doc prefix bounds for the candidate prune: the Bayardo cum
    // bound and the prefix ℓ² norm (absent row = everything indexed).
    val prefixUb = prefix.groupBy("id")
      .agg(max(col("cum")).as("pb"),
        sqrt(sum(col("w") * col("w"))).as("prefnorm"))

    val index = flagged.filter(col("indexed"))
      .select(col("id"), col("term"), col("w"), col("tf"))
    val probe = wtf.select(col("id").as("pid"), col("term"),
      col("w").as("pw"), col("tf").as("ptf"))

    // Candidate pairs: pruned index ⋈ full postings on term, keeping
    // only the orientation where the INDEXED side has the smaller id —
    // complete because a qualifying pair shares indexed terms of BOTH
    // sides. The aggregate folds the join's fan-out down map-side and
    // computes, over the shared indexed terms: the exact unit-weight
    // mass, the exact integer partial dot, and the partner's squared
    // mass (for the Cauchy–Schwarz residual bound √(1−sb)).
    val candidates = index.join(probe, "term")
      .filter(col("id") < col("pid"))
      .groupBy(col("id").as("doc_a"), col("pid").as("doc_b"))
      .agg(sum(col("w") * col("pw")).as("shared_mass"),
        sum(col("tf") * col("ptf")).as("sdot"),
        sum(col("pw") * col("pw")).as("sb"))
      .join(prefixUb.withColumnRenamed("id", "doc_a"), Seq("doc_a"), "left")
      .filter(col("shared_mass") +
        least(coalesce(col("pb"), lit(0.0)),
          coalesce(col("prefnorm"), lit(0.0)) *
            sqrt(greatest(lit(0.0), lit(1.0) - col("sb")))) >=
        lit(tau - margin))
      .select(col("doc_a"), col("doc_b"), col("sdot"))

    // Completion: the full dot = shared-indexed dot + dot over the
    // indexed side's unindexed PREFIX postings only — two hash joins
    // with candidate-bounded fan-out, partial-aggregable sum, no maps,
    // no second tokenization.
    val prefA = prefix.select(col("id").as("doc_a"), col("term"),
      col("tf").as("tfa"))
    val tb = tf.select(col("id").as("doc_b"), col("term"),
      col("tf").as("tfb"))
    val rdots = candidates.join(prefA, Seq("doc_a"))
      .join(tb, Seq("doc_b", "term"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("tfa") * col("tfb")).as("rdot"))
    val dots = candidates.join(rdots, Seq("doc_a", "doc_b"), "left")
      .withColumn("dot", col("sdot") + coalesce(col("rdot"), lit(0L)))

    val na = n2.select(col("id").as("doc_a"), col("n2").as("na"))
    val nb = n2.select(col("id").as("doc_b"), col("n2").as("nb"))
    // Threshold compare in DECIMAL(38,0): q²·dot² and p²·na·nb exceed
    // Long for ~1e9-Σtf² docs, and non-ANSI bigint arithmetic would
    // WRAP silently there (an external oracle errors instead — the
    // engines would diverge exactly where exactness is claimed).
    // Decimal keeps the compare integer-exact while q²·na·nb < 10³⁸,
    // i.e. per-doc Σtf² < 10¹⁷/q — a ≥ 10⁸-token single document
    // before the bound is approachable. Beyond it Spark yields null
    // (row dropped) rather than a wrapped wrong answer.
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    dots.join(na, "doc_a").join(nb, "doc_b")
      .filter(d38(lit(tauDen.toLong * tauDen)) * d38(col("dot")) * d38(col("dot")) >=
        d38(lit(tauNum.toLong * tauNum)) * d38(col("na")) * d38(col("nb")))
      .select(col("doc_a"), col("doc_b"), col("dot"), col("na"), col("nb"))
  }
}
