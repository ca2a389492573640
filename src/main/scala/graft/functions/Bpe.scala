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

  /** Adjacent-pair structs (l, r, d) of a delimited state column,
    * each weighted `d` — the shared explode shape of the recount and
    * incremental trainers. A single-symbol state yields an empty
    * array (slice of length 0), so no size filter is needed. */
  private def pairArr(s: org.apache.spark.sql.Column,
                      d: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val sy = syms(s)
    zip_with(
      slice(sy, lit(1), size(sy) - 1),
      slice(sy, lit(2), size(sy) - 1),
      (a, b) => struct(a.as("l"), b.as("r"), d.as("d")))
  }

  /** Learn the top-`k` BPE merges with PAIR-COUNT DELTA maintenance —
    * the same merge table as [[bpeTrain]] bit-for-bit (same counts,
    * same pinned tie-break), at the cost profile a real tokenizer
    * vocabulary (k ≈ 32 000) needs. [[bpeTrain]] re-derives EVERY
    * adjacent pair of EVERY vocabulary word each iteration — k
    * vocab-wide explodes, shuffles, and driver round-trips for counts
    * of which only the pairs overlapping the merged pair's
    * occurrences changed. This form is the classic incremental BPE
    * trainer distributed the HeavyHitters way (decide on the driver,
    * count on the cluster):
    *
    *  - the pair-count table lives ON THE DRIVER — it is bounded by
    *    the corpus's distinct adjacent-pair DIVERSITY (≲ |symbols|²;
    *    a byte-level alphabet starts at ≤ 65 536 entries and grows
    *    by O(1) per merge), never by corpus or vocabulary size, and
    *    `maxPairs` enforces the bound loudly. Built by ONE
    *    vocabulary-wide count (the only full pair derivation
    *    anywhere), updated additively per merge. Argmax and
    *    tie-break are a driver scan — no job at all.
    *  - per merge, ONE Spark job: words whose current state contains
    *    the merged pattern (a codegen'd `contains` filter — map-only
    *    vocab scan, no explode, no shuffle for the non-matching
    *    rest) emit their old pairs at −freq and post-merge pairs at
    *    +freq in a single explode; the collected delta (pair-table-
    *    bounded) folds into the driver map.
    *  - symbol state is rewritten lazily: pending merges stay
    *    chained codegen'd `replace`s and the state column only
    *    materializes every `rewriteEvery` merges, so k merges cost
    *    k/rewriteEvery state writes, not k.
    *
    * Per merge: 1 delta-sized job against [[bpeTrain]]'s 2
    * vocabulary-sized jobs. Exactness is gated (t15's DuckDB oracle
    * runs this form) and BpeSpec pins equality with the recount
    * trainer; BpeSoak measures the k = 512 crossover. */
  def bpeTrainIncremental(docs: DataFrame, textCol: String, k: Int,
                          rewriteEvery: Int = 16,
                          maxPairs: Int = 1 << 22): DataFrame = {
    require(k >= 1, "need at least one merge")
    require(rewriteEvery >= 1, "rewriteEvery must be positive")
    val spark = docs.sparkSession
    // the one corpus-sized pass: word occurrence frequencies, folded
    // straight into the initial symbol state
    var base = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), initState(col("w")).as("s"))
      .localCheckpoint()
    var pending = Vector.empty[(String, String)] // merges not yet in base
    def curState = applyMerges(col("s"), pending)
    // the full pair derivation runs ONCE, here; the aggregated table
    // (diversity-bounded, guarded) moves to the driver
    val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    def foldInto(rows: Array[Row]): Unit = {
      rows.foreach { row =>
        val key = (row.getString(0), row.getString(1))
        val cnt = pc.getOrElse(key, 0L) + row.getLong(2)
        if (cnt == 0L) pc.remove(key) else pc.update(key, cnt)
      }
      require(pc.size <= maxPairs,
        s"pair table ${pc.size} exceeds maxPairs $maxPairs — adjacent-" +
          "pair diversity outgrew the driver bound; raise maxPairs or " +
          "pre-segment the token alphabet")
    }
    foldInto(base
      .select(explode(pairArr(col("s"), col("freq"))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("p.d")).as("cnt"))
      .collect())
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var i = 1
    var exhausted = false
    while (i <= k && !exhausted) {
      if (pc.isEmpty) exhausted = true
      else {
        // argmax with the pinned tie-break (count desc, l asc, r asc)
        // — a driver scan of the bounded table, no job
        val ((l, r), cnt) = pc.minBy { case ((pl, pr), c) => (-c, pl, pr) }
        merges += ((i, l, r, cnt))
        val pat = Sep + l + Sep + Sep + r + Sep
        val rep = Sep + l + r + Sep
        // only words whose CURRENT state contains the merged pair
        // change any count; one explode emits their old pairs at
        // −freq and new pairs at +freq
        foldInto(base
          .select(col("freq"), curState.as("s"))
          .filter(col("s").contains(pat))
          .withColumn("s2", replace(col("s"), lit(pat), lit(rep)))
          .select(explode(concat(
            pairArr(col("s"), -col("freq")),
            pairArr(col("s2"), col("freq")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("p.d")).as("cnt"))
          .collect())
        pending :+= ((l, r))
        if (pending.size >= rewriteEvery) {
          base = base.select(col("freq"), curState.as("s")).localCheckpoint()
          pending = Vector.empty
        }
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
