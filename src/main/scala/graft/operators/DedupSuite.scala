package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus-scale deduplication — exact, MinHash+LSH, SimHash.
  * Extension operators for training-data pipelines (SURVEY §7.1).
  *
  * Scale design:
  *  - Exact dedup is a hash-groupBy: map-side partial `min` collapses
  *    per-hash groups before the single shuffle on the 16-byte digest —
  *    the canonical 100 TB exact-dedup plan.
  *  - MinHash/LSH turns all-pairs O(n²) similarity into a shuffle on
  *    (band, band_hash): only docs sharing a band bucket ever meet.
  *    Bucket sizes are bounded by the band width r (collision prob
  *    s^r), so the pair blow-up is controlled; hot buckets (boilerplate
  *    docs) are the skew risk and are capped via `maxBucket`.
  *  - All hashing is MD5-derived (engine-portable, deterministic), no
  *    JVM-specific `hashCode`.
  */
object DedupSuite {

  /** Exact dedup: keep the minimum id per md5(text). Returns the kept
    * rows with their content hash. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = df.select(col(idCol), md5(col(textCol)).as("content_hash"))
    h.groupBy("content_hash")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).cast("bigint").as("n_copies"))
      .select(col(idCol), col("content_hash"), col("n_copies"))
  }

  /** Word n-gram shingles from a text column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array())
  }

  /** MinHash signature: k independent 32-bit hash functions (salted
    * MD5), each min-folded over the shingle set. Null if no shingles. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    when(size(shingleCol) > 0,
      array((0 until k).map(i =>
        array_min(transform(shingleCol, s => hash32(s, i)))): _*))
      .otherwise(lit(null))

  /** LSH banding: docs×bands rows of (id, band, band_hash). b bands of
    * width r must satisfy b*r == signature length. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
               b: Int, r: Int): DataFrame =
    df.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(b - 1)),
          j => md5(concat_ws(",", slice(col(sigCol), j * r + 1, lit(r)))))))
      .toDF(idCol, "band", "band_hash")

  /** Candidate pairs from shared LSH buckets (id_a < id_b), with hot
    * buckets above `maxBucket` docs dropped (boilerplate guard — at
    * corpus scale a near-universal shingle bucket would otherwise emit
    * O(bucket²) pairs). */
  def candidatePairs(bands: DataFrame, idCol: String,
                     maxBucket: Int = 1000): DataFrame = {
    val sized = bands
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band", "band_hash")))
      .filter(col("bucket_n") <= maxBucket)
    val a = sized.select(col("band"), col("band_hash"), col(idCol).as("id_a"))
    val b = sized.select(col("band"), col("band_hash"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact n-gram Jaccard over shingle SETS (distinct semantics, like
    * `array_intersect`/`array_union`), as exact decimal. */
  def jaccard(aShingles: Column, bShingles: Column): Column = {
    val ic = size(array_intersect(aShingles, bShingles)).cast("decimal(18,6)")
    val uc = size(array_union(aShingles, bShingles)).cast("decimal(18,6)")
    when(uc > 0, (ic / uc).cast("decimal(10,6)"))
      .otherwise(lit(0).cast("decimal(10,6)"))
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band →
    * bucket-join → exact-Jaccard verify ≥ `threshold`. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.select(col(idCol), minhashSignature(col("sh"), k).as("sig"))
    val cand = candidatePairs(lshBands(sig, idCol, "sig", bands, k / bands), idCol)
    cand
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 60-bit SimHash over token hashes: bit i of the result is set iff
    * the (+1/−1)-weighted count of tokens with bit i set is positive.
    * Token hashes are computed once, then folded per bit — 60 integer
    * folds per doc, all inside whole-stage codegen. */
  def simhash60(text: Column): Column = {
    val hs = transform(tokens(text), t => hash60(t))
    aggregate(
      transform(sequence(lit(0), lit(59)), i =>
        when(
          aggregate(hs, lit(0L), (acc, h) =>
            acc + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1L)
              .otherwise(-1L)) > 0,
          call_function("shiftleft", lit(1L), i))
          .otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }
}
