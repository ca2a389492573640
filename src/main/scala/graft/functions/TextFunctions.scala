package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * tokenization, token counting, stopword/quality metrics, language ID,
  * document fingerprinting. Extensions beyond the reference (SURVEY §7.1),
  * generalizing its string pipeline C9.
  *
  * All functions are pure `Column` combinators over built-ins — no UDFs,
  * fully codegen'd, embarrassingly parallel (no shuffle), so they scale
  * linearly with input splits. Hashes are MD5-derived (not Spark's
  * murmur `hash()`) so results are engine-portable and the DuckDB oracle
  * can reproduce them bit-for-bit.
  */
object TextFunctions {

  /** Lowercased alphanumeric tokens; leading-delimiter empties removed.
    * Oracle twin: `list_filter(string_split_regex(lower(c),'[^a-z0-9]+'), x -> x <> '')`. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  /** Whitespace-family token count. */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("int")

  /** BPE-ish token count: a GPT-style pre-tokenizer regex (word /
    * number / punctuation runs with optional leading space) counted with
    * `regexp_count`. Approximates LLM token budgets without a vocab. */
  val BpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
  def bpeTokenCount(c: Column): Column =
    regexp_count(lower(c), lit(BpePattern)).cast("int")

  /** Portable 32-bit hash: first 8 hex chars of md5, as unsigned int in
    * a long. `salt` indexes independent hash functions (minhash family). */
  def hash32(c: Column, salt: Int = 0): Column =
    conv(substring(md5(concat(lit(salt.toString), lit(":"), c)), 1, 8), 16, 10)
      .cast("long")

  /** Portable 60-bit hash (15 hex chars — stays positive in a signed
    * 64-bit integer in every engine). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Small per-language stopword lists for the n-gram-free language-ID
    * heuristic. Deliberately tiny: language ID at pipeline scale is a
    * cheap filter, not a classifier. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "los", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"))

  /** Count of tokens contained in `words`. */
  def hitCount(toks: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(arr, t))).cast("int")
  }

  /** Language ID by stopword-hit argmax with fixed priority tie-break
    * (en > es > de > fr > und). Zero hits everywhere → 'und'. The four
    * hit counts are let-bound as one struct so each stopword filter
    * scans the token array exactly once — Column trees have no sharing,
    * and the `greatest` + per-branch comparisons would otherwise
    * re-evaluate every count 2-3×. */
  def langId(toks: Column): Column = {
    val order = Seq("en", "es", "de", "fr")
    ColUtil.bindOnce(
      struct(order.map(l => hitCount(toks, stopwords(l)).as(l)): _*)) { c =>
      val counts = order.map(l => l -> c.getField(l)).toMap
      val best = greatest(order.map(counts): _*)
      order.foldRight(lit("und")) { (l, elseC) =>
        when(best > 0 && counts(l) === best, lit(l)).otherwise(elseC)
      }
    }
  }

  /** Quality score in [0,1] as DOUBLE: mix of length saturation and
    * stopword ratio — the standard cheap pre-filters for LLM corpus
    * cleaning. Every operation is an IEEE double op on exactly-derived
    * operands (integer→double conversion and division are correctly
    * rounded in both engines; ×2 and ÷2 are exact), so the score is
    * bit-identical cross-engine with NO decimal rounding step — a
    * decimal-rounded quotient diverges between engines on exact halves
    * (hit at sf0.001). */
  def qualityScore(text: Column): Column =
    ColUtil.bindOnce(tokens(text))(qualityScoreFromTokens)

  /** [[qualityScore]] over a pre-materialized (or let-bound) token
    * array — use with [[ColUtil.bindOnce]] in pipelines so the
    * tokenizer runs once per row, not once per sub-term. */
  def qualityScoreFromTokens(toks: Column): Column =
    qualityScoreFromCounts(size(toks).cast("long"),
      hitCount(toks, stopwords("en")).cast("long"))

  /** [[qualityScore]] from already-computed counts — for callers that
    * surface n/stop_hits alongside the score (avoids re-scanning the
    * token array for counts they already hold). */
  def qualityScoreFromCounts(n: Column, stopHits: Column): Column = {
    // length saturation: min(n, 200)/200 — correctly-rounded double
    val lenScore = least(n, lit(200L)).cast("double") / lit(200.0)
    // stopword ratio clipped to [0, 0.5] then scaled ×2 (exact in binary)
    val stopRatio = when(n > 0, stopHits.cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
    val stopScore = least(stopRatio, lit(0.5)) * 2.0
    (lenScore + stopScore) / 2.0
  }

  /** Order-sensitive document fingerprint: left fold of a polynomial
    * rolling hash over token hash32s, mod 1e9+7 (keeps every
    * intermediate in exact integer range for all engines).
    * Oracle twin: `list_reduce(list_prepend(0, hashes), (a,b) -> (a*31+b) % 1000000007)`. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), t => hash32(t)),
      lit(0L),
      (acc, h) => (acc * 31 + h) % 1000000007L)

  /** Tracking query params dropped during URL canonicalization. */
  val TrackingParamPrefixes: Seq[String] =
    Seq("utm_", "fbclid=", "gclid=")

  /** Canonical form of a URL for dedup-by-source: crawl corpora carry
    * the same page under many surface forms (case-shifted scheme/host,
    * explicit default port, tracking params, param order, trailing
    * slash, fragment). Canonicalization collapses them so URL-level
    * dedup actually merges:
    *   - scheme + host lowercased, leading `www.` and `:443`/`:80` port
    *     stripped
    *   - path trailing slashes stripped
    *   - fragment dropped
    *   - query params: tracking params removed, the rest sorted
    * Pure built-in regexp/array combinators — codegen'd, no shuffle —
    * with an exact DuckDB twin (see t13's oracle). */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = regexp_replace(
      regexp_replace(lower(hostport), "^www\\.", ""), ":(443|80)$", "")
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    // strip the fragment BEFORE extracting the query: matching "\\?"
    // on the raw url would catch a '?' living inside the fragment
    // (SPA routes like "#/route?tab=1") and resurrect it as a query
    // string even though the fragment is supposed to be dropped
    val noFrag = regexp_replace(url, "#.*$", "")
    val params = array_sort(filter(
      split(regexp_extract(noFrag, "\\?(.*)$", 1), "&"),
      p => TrackingParamPrefixes.map(pre => !p.startsWith(pre))
        .foldLeft(p =!= "")(_ && _)))
    concat(scheme, lit("://"), host, path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }
}
