package graft

import org.apache.spark.sql.functions._
import graft.operators.Apss

/** APSS (d17) at the data shape the operator is designed for: a
  * Zipf-distributed vocabulary, where the naive term join explodes on
  * the head terms and prefix filtering must prune them. The gate
  * corpus cannot show this (31 uniform terms defeat every exact
  * prune — see the Apss scaladoc), so this soak generates a
  * deterministic Zipfian corpus and checks three invariants:
  *
  *  1. EXACTNESS on a slice: prefix-filtered pairs == the naive
  *     term-join plan's pairs, bit-for-bit, with planted near-dups
  *     present (the ApssSpec brute-force check at 40 docs, here at
  *     ~2k docs against the join-based naive form).
  *  2. PRUNING at scale: Σ_t df(t)·idxdf(t) — the candidate join's
  *     exact row count — must be ≤ 20% of Σ_t df(t)² (the naive
  *     join's row count). On Zipf text the ratio is far lower: the
  *     df-descending prefix order makes head terms the FIRST skipped.
  *  3. DETERMINISM + planted recall at scale: two runs bit-identical;
  *     every planted near-dup pair (cos = √(n2/(n2+1)) ≥ 0.98) found.
  *
  * Corpus: nDocs docs × 30 tokens, token rank r = ⌊V^u⌋ with u a
  * per-(doc,pos) hash — P(rank = r) ∝ 1/r, the classic Zipf(1) shape
  * — plus 500 planted one-token-appended variants. No RNG, no
  * Date.now: everything derives from xxhash64.
  */
object ApssSoak {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(50000L)
    val vocab = 50000
    val nPlant = 500L
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val toks = (0 until 30).map { p =>
      val u = pmod(xxhash64(col("id") * 31L + lit(p)), lit(1000003L))
        .cast("double") / 1000003.0
      concat(lit("t"), floor(exp(u * math.log(vocab.toDouble))).cast("long"))
    }
    val base = spark.range(nDocs)
      .select(col("id").as("doc_id"), concat_ws(" ", toks: _*).as("text"))
    val planted = base.filter(col("doc_id") < nPlant)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" zzzplant")).as("text"))
    val docs = base.unionByName(planted)

    // 1. Exactness on a slice (~2k docs incl. planted variants).
    val slice = docs.filter(col("doc_id") % 10000000L < 1500L)
    val fast = Apss.cosinePairs(slice, "doc_id", "text", 9, 10)
      .select("doc_a", "doc_b", "dot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val tfS = Apss.termFreqs(slice, "doc_id", "text")
    val n2S = tfS.groupBy("id").agg(sum(col("tf") * col("tf")).as("n2"))
    val naive = tfS.select(col("id").as("doc_a"), col("term"), col("tf").as("ta"))
      .join(tfS.select(col("id").as("doc_b"), col("term"), col("tf").as("tb")), "term")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(sum(col("ta") * col("tb")).as("dot"))
      .join(n2S.select(col("id").as("doc_a"), col("n2").as("na")), "doc_a")
      .join(n2S.select(col("id").as("doc_b"), col("n2").as("nb")), "doc_b")
      .filter(lit(100L) * col("dot") * col("dot") >= lit(81L) * col("na") * col("nb"))
      .select("doc_a", "doc_b", "dot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(fast == naive,
      s"slice mismatch: fast=${fast.size} naive=${naive.size} " +
        s"missing=${(naive -- fast).take(3)} extra=${(fast -- naive).take(3)}")
    require(naive.nonEmpty, "slice fixture found no pairs at all")

    // 2. Pruning accounting at full scale: exact candidate-join row
    // count (Σ df·idxdf) vs the naive join's (Σ df²).
    val flagged = Apss.flaggedPostings(docs, "doc_id", "text", 9, 10)
    val perTerm = flagged.groupBy("term").agg(count(lit(1)).as("df"),
      sum(when(col("indexed"), 1L).otherwise(0L)).as("idxdf"))
    val acct = perTerm
      .select(sum(col("df") * col("df")).as("naive_rows"),
        sum(col("df") * col("idxdf")).as("cand_rows"))
      .head()
    val naiveRows = acct.getLong(0)
    val candRows = acct.getLong(1)
    require(candRows * 5L <= naiveRows,
      s"prefix filter not pruning on Zipf data: cand=$candRows naive=$naiveRows")

    // 3. Full run: deterministic, planted pairs all found.
    val (pairs1, t1) = time {
      Apss.cosinePairs(docs, "doc_id", "text", 9, 10)
        .collect().map(_.toString).sorted.toSeq
    }
    val (pairs2, t2) = time {
      Apss.cosinePairs(docs, "doc_id", "text", 9, 10)
        .collect().map(_.toString).sorted.toSeq
    }
    require(pairs1 == pairs2, "apss pairs not deterministic across runs")
    val found = Apss.cosinePairs(docs, "doc_id", "text", 9, 10)
      .filter(col("doc_b") === col("doc_a") + 10000000L)
      .count()
    require(found == nPlant,
      s"planted near-dup recall hole: $found of $nPlant found")

    // 4. Incremental invariant (d18): index-probe pairs against a new
    // batch == full-corpus pairs over corpus ∪ batch restricted to
    // (corpus, batch) — checked on the slice, where the full run is
    // cheap and section 1 already proved the full run itself naive-
    // exact. Batch = near-dup clones of every 3rd slice doc (kept
    // pairs guaranteed) at collision-free ids.
    val incBatch = slice.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 40000000L).as("doc_id"),
        concat(col("text"), lit(" zzzinc")).as("text"))
    val incPairs = Apss.incrementalPairs(
        Apss.buildIndex(slice, "doc_id", "text", 9, 10),
        incBatch, "doc_id", "text", 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fullRestricted = Apss.cosinePairs(slice.unionByName(incBatch),
        "doc_id", "text", 9, 10)
      .filter((col("doc_a") >= 40000000L) =!= (col("doc_b") >= 40000000L))
      .collect().map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        if (a < 40000000L) (a, b, r.getLong(2)) else (b, a, r.getLong(2))
      }.toSet
    require(incPairs == fullRestricted,
      s"incremental invariant broken: inc=${incPairs.size} " +
        s"full=${fullRestricted.size} " +
        s"missing=${(fullRestricted -- incPairs).take(3)} " +
        s"extra=${(incPairs -- fullRestricted).take(3)}")
    require(incPairs.nonEmpty, "incremental slice fixture found no pairs")

    // 5. Incremental at full scale: probe the 50k-doc corpus index
    // with 500 planted near-dup clones — recall must be total, and
    // the probe should cost a small fraction of a full-corpus run.
    val bigBatch = base.filter(col("doc_id") < nPlant)
      .select((col("doc_id") + 40000000L).as("doc_id"),
        concat(col("text"), lit(" zzzinc")).as("text"))
    val bigIndex = Apss.buildIndex(docs, "doc_id", "text", 9, 10)
      .persist()
    bigIndex.count() // index build paid once, as a persisted corpus epoch
    val (incFound, tInc) = time {
      Apss.incrementalPairs(bigIndex, bigBatch, "doc_id", "text", 9, 10)
        .filter(col("doc_b") === col("doc_a") + 40000000L)
        .count()
    }
    require(incFound == nPlant,
      s"incremental planted recall hole: $incFound of $nPlant found")
    bigIndex.unpersist()

    println(s"""{"docs":${nDocs + nPlant},"vocab":$vocab,""" +
      s""""naive_join_rows":$naiveRows,"cand_join_rows":$candRows,""" +
      s""""prune_ratio":${candRows.toDouble / naiveRows},""" +
      s""""pairs":${pairs1.size},"planted_found":$found,""" +
      s""""inc_slice_pairs":${incPairs.size},"inc_planted_found":$incFound,""" +
      s""""sec":{"run1":$t1,"run2":$t2,"inc_probe":$tInc}}""")
    spark.stop()
  }
}
