package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) merge training — the
  * tokenizer-training half of an LLM data pipeline (t15). Learns the
  * top-k merge rules over a corpus exactly as the reference BPE
  * algorithm does: repeatedly count adjacent symbol pairs (weighted by
  * word frequency), merge the globally most frequent pair, repeat.
  *
  * 100-TB economics: the corpus is scanned ONCE (the word-frequency
  * aggregation — partial-aggregated, shuffle sized by the
  * vocabulary). Every merge iteration then operates on the VOCABULARY
  * (distinct words), not the corpus: one vocab-sized pair count
  * (map-side combined, shuffle = distinct adjacent pairs), one 1-row
  * argmax fetch, one vocab-sized merge application. k iterations cost
  * k vocab passes + one corpus pass — never k corpus scans. Iteration
  * state is localCheckpoint'd so lineage stays flat across k rounds.
  *
  * Symbol state is a delimited string `␟s1␟␟s2␟␟s3␟` (US char ,
  * absent from the token alphabet): applying merge (a,b) is then ONE
  * literal `replace` of `␟a␟␟b␟` with `␟ab␟`, and because literal
  * replace scans left-to-right non-overlapping in every engine, it IS
  * greedy BPE application — [a,a,a] under merge (a,a) yields [aa,a],
  * never [a,aa] or [aa,aa]. The same replace runs verbatim in the
  * DuckDB oracle, which is what makes the learned merge table
  * hash-exact cross-engine (tie-breaks pinned: count desc, then left
  * asc, right asc — binary collation on the [a-z0-9] alphabet agrees
  * everywhere).
  *
  * Stops early (fewer than k rows) if the vocabulary saturates — every
  * word reduced to a single symbol. */
object Bpe {

  private val Sep = "\u001f" // ASCII unit separator, outside [a-z0-9]

  /** Symbols of a delimited state string, in order. */
  private def syms(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(s, Sep), x => x =!= "")

  /** Learn the top-`k` BPE merges over `textCol`'s token stream.
    * Output: (mrank INT, lhs, rhs, cnt BIGINT) — merge rank (1-based),
    * the merged pair, and its weighted occurrence count at the time it
    * was chosen. */
  def bpeTrain(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "need at least one merge")
    val spark = docs.sparkSession
    // the one corpus-sized pass: word occurrence frequencies
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    // initial state: every character its own symbol
    var state = words.select(col("w"), col("freq"),
        initState(col("w")).as("s"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var i = 1
    var exhausted = false
    while (i <= k && !exhausted) {
      val best = state
        .select(col("freq"), syms(col("s")).as("sy"))
        .filter(size(col("sy")) >= 2)
        .select(col("freq"), explode(zip_with(
          slice(col("sy"), lit(1), size(col("sy")) - 1),
          slice(col("sy"), lit(2), size(col("sy")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((i, l, r, cnt))
        state = state.withColumn("s",
            replace(col("s"), lit(Sep + l + Sep + Sep + r + Sep),
              lit(Sep + l + r + Sep)))
          .localCheckpoint()
        i += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.toList.map(m => Row(m._1, m._2, m._3, m._4)), 1),
      StructType(Seq(
        StructField("mrank", IntegerType), StructField("lhs", StringType),
        StructField("rhs", StringType), StructField("cnt", LongType))))
  }

  /** Initial per-character symbol state for a word column. */
  private def initState(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit(Sep),
      array_join(transform(sequence(lit(1), length(w)),
        i => w.substr(i, lit(1))), Sep + Sep),
      lit(Sep))

  /** Apply a learned merge table (in rank order) to a delimited state
    * string: k chained literal replaces, all codegen'd — encoding is a
    * map-only pass, no shuffle, no per-row loop. Greedy left-to-right
    * per merge, merges in training order: exactly reference BPE
    * encoding. */
  def applyMerges(state: org.apache.spark.sql.Column,
                  merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    merges.foldLeft(state) { case (s, (l, r)) =>
      replace(s, lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep))
    }

  /** Encode `textCol` under `merges` and return the corpus token
    * frequency table (token, cnt) — the tokenizer-evaluation query
    * (vocabulary utilization / compression).
    *
    * Encoding is per-word, so the corpus-sized explode is replaced by
    * the word-frequency aggregation (the same single corpus pass
    * t15's training pays) and every downstream step is
    * VOCABULARY-sized with counts weighted by word frequency —
    * bit-identical to encoding every occurrence, at a fraction of the
    * shuffle. */
  def encodeTokenCounts(docs: DataFrame, textCol: String,
                        merges: Seq[(String, String)]): DataFrame = {
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), applyMerges(initState(col("w")), merges).as("s"))
      .select(col("freq"), explode(syms(col("s"))).as("token"))
      .groupBy(col("token")).agg(sum(col("freq")).as("cnt"))
  }
}
