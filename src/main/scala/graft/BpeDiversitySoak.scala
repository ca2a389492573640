package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe

/** BPE trainer under ADVERSARIAL pair diversity: a unicode-alphabet
  * corpus whose pass-one adjacent-pair table (≥10⁷ distinct pairs)
  * dwarfs any sane driver bound — the shape a 100 TB multilingual
  * corpus presents on day one. The truncated-table trainer must hold
  * driver state at `maxPairs` (collects are capped there by
  * construction — the count histogram picks the floor BEFORE any
  * pair row reaches the driver) and still produce the EXACT merge
  * table: the oracle is the same trainer with the table bound set
  * above the corpus's full diversity (itself gate-proven equal to
  * the recount trainer), so any truncation-induced divergence —
  * wrong pair, wrong count, wrong order — fails the equality.
  *
  * Corpus: 8 M words of 8 chars drawn from a 3600-char CJK alphabet
  * via xxhash64 of (id, position) — ~12.9 M possible ordered pairs,
  * ~56 M draws, so the realized distinct-pair table lands ≥10⁷.
  * Words are built with `substr` over one alphabet literal — no UDF,
  * no driver-side generation. Deterministic: no RNG, no clock.
  *
  * Needs SPARK_DRIVER_MEM=24g for the ORACLE run (it collects the
  * full ~12 M-row pair table — the exact thing the bounded trainer
  * exists to avoid); the truncated run needs only `maxPairs` rows.
  */
object BpeDiversitySoak {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(256)
    val nWords = 8000000L
    val alphaN = 3600
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // one 3600-char literal (CJK block — single-codepoint BMP chars,
    // no separator collisions); char j of word id = a deterministic
    // hash-indexed substr into it
    val alphabet = new String((0x4E00 until 0x4E00 + alphaN)
      .map(_.toChar).toArray)
    val wordChars = (0 until 8).map { j =>
      substring(lit(alphabet),
        (pmod(xxhash64(col("id"), lit(j)), lit(alphaN.toLong)) + 1)
          .cast("int"), lit(1))
    }
    val docs = spark.range(nWords)
      .select(concat(wordChars: _*).as("text"))
      .repartition(32)
    // whitespace tokenizer: each row is exactly one unicode word
    val tok = (c: org.apache.spark.sql.Column) =>
      filter(split(c, "\\s+"), t => t =!= "")

    // measured pass-one diversity: distinct ordered adjacent char
    // pairs across all words — the claim the soak name makes
    val (diversity, tDiv) = time {
      docs.select(explode(array((0 until 7).map(j =>
          substring(col("text"), j + 1, 2)): _*)).as("p"))
        .distinct().count()
    }
    require(diversity >= 10000000L,
      s"fixture must present >= 1e7 distinct pairs, got $diversity")
    println(f"[diversity] $diversity pairs, probe $tDiv%.1f s")

    // truncated run: driver table capped FOUR ORDERS below diversity
    val ((truncated, tTrunc), (oracle, tOracle)) = {
      val t = time {
        Bpe.bpeTrainIncremental(docs, "text", k, maxPairs = 4096,
            tokenize = tok)
          .collect().map(r => (r.getInt(0), r.getString(1),
            r.getString(2), r.getLong(3))).toSeq
      }
      val o = time {
        Bpe.bpeTrainIncremental(docs, "text", k, maxPairs = 1 << 24,
            tokenize = tok)
          .collect().map(r => (r.getInt(0), r.getString(1),
            r.getString(2), r.getLong(3))).toSeq
      }
      (t, o)
    }
    require(truncated == oracle,
      s"truncated (maxPairs=4096) merge table diverged from the " +
        s"complete-table oracle: ${truncated.take(3)} vs ${oracle.take(3)}")
    require(oracle.size == k, s"expected $k merges, got ${oracle.size}")

    println(
      s"""{"words":$nWords,"alphabet":$alphaN,"k":$k,
         |"pair_diversity":$diversity,
         |"sec":{"truncated":${f"$tTrunc%.1f"},"oracle":${f"$tOracle%.1f"}}}"""
        .stripMargin.replace("\n", ""))
    spark.stop()
  }
}
