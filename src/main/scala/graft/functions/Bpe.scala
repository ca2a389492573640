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
    * was chosen. `tokenize` overrides the corpus tokenizer (default:
    * the engine's [a-z0-9] word splitter) — e.g. a whitespace split
    * for unicode-alphabet corpora; tokens must not contain the
    * internal separator (U+001F). */
  def bpeTrain(docs: DataFrame, textCol: String, k: Int,
               tokenize: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                 TextFunctions.tokens): DataFrame = {
    require(k >= 1, "need at least one merge")
    val spark = docs.sparkSession
    // the one corpus-sized pass: word occurrence frequencies
    val words = docs
      .select(explode(tokenize(col(textCol))).as("w"))
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

  /** [[pairArr]] with a batch-step tag `j` — the batched trainer's
    * per-step delta shape. */
  private def pairArrStep(s: org.apache.spark.sql.Column,
                          d: org.apache.spark.sql.Column,
                          j: Int): org.apache.spark.sql.Column = {
    val sy = syms(s)
    zip_with(
      slice(sy, lit(1), size(sy) - 1),
      slice(sy, lit(2), size(sy) - 1),
      (a, b) => struct(a.as("l"), b.as("r"), d.as("d"), lit(j).as("j")))
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
    *  - the pair-count table lives ON THE DRIVER — TRUNCATED to the
    *    pinned-order top `maxPairs` entries plus a COUNT FLOOR: every
    *    absent pair's exact count is ≤ floor (0 while the table is
    *    complete), so the argmax is provably global while the best
    *    retained count strictly beats the floor, and a recount
    *    refills the table when it no longer does. A unicode-rich
    *    corpus whose adjacent-pair diversity outgrows `maxPairs`
    *    therefore degrades to an extra vocabulary-sized recount per
    *    ~maxPairs-deep descent instead of failing (or overflowing
    *    driver heap). Built/refilled by a vocabulary-wide count whose
    *    COLLECT is capped at maxPairs rows (a count histogram picks
    *    the floor first — the full diversity never reaches the
    *    driver), updated additively per merge. Argmax and tie-break
    *    are a driver scan — no job at all.
    *  - merges are applied in BATCHES of guesses per Spark job (the
    *    r14 trainer paid one driver-coordinated job per merge — a
    *    real vocabulary, k ≈ 32 000, is then 32 000 sequential
    *    round-trips of pure job latency). The guess for a batch of m
    *    is simply the pinned-order TOP-m of the current pair table —
    *    sharing symbols is allowed, because a shared symbol does not
    *    imply a changed count, and exactness never rests on the
    *    guess; ONE job computes the per-step count deltas of applying
    *    the guessed sequence IN ORDER (words matching any batch
    *    pattern emit, per step they change at, old pairs at −freq and
    *    new pairs at +freq — valid for any sequence, interacting or
    *    not).
    *  - the driver VERIFIES each guess: step j is accepted only if
    *    the exact table argmax — after folding the deltas of steps
    *    < j — still equals guess j (pinned tie-break included); a
    *    merge CAN reorder the top (decrementing an overlapping pair
    *    below its neighbor, or promoting a freshly-created pair above
    *    it), and on the first such mismatch the batch tail's deltas
    *    are discarded, nothing having been mutated for them, and the
    *    loop re-selects from the exact table. Every accepted merge is
    *    therefore bit-identical to the one-at-a-time trainer; the
    *    guess quality only buys the acceptance rate (adversarial
    *    corpora degrade gracefully toward one merge per job, never
    *    toward a wrong table).
    *  - batch size is ADAPTIVE (AIMD on the live acceptance rate,
    *    capped at `batchMerges`): a rejected tail is wasted executor
    *    work, so the size doubles from 4 on fully-accepted batches
    *    and resets to what was actually accepted on a rejection —
    *    corpora whose top reorders every merge settle near 1–2 guesses
    *    per job, stable ones ride at the cap.
    *  - symbol state is rewritten lazily: pending merges stay
    *    chained codegen'd `replace`s and the state column only
    *    materializes every `rewriteEvery` merges, so k merges cost
    *    k/rewriteEvery state writes, not k.
    *
    * Per ACCEPTED BATCH: 1 delta-sized job against [[bpeTrain]]'s 2
    * vocabulary-sized jobs per merge. Exactness is gated (t15's
    * DuckDB oracle runs this form) and BpeSpec pins equality with the
    * recount trainer; BpeSoak measures the crossover and the batch
    * acceptance rate. */
  def bpeTrainIncremental(docs: DataFrame, textCol: String, k: Int,
                          rewriteEvery: Int = 16,
                          maxPairs: Int = 1 << 22,
                          batchMerges: Int = 64,
                          tokenize: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                            TextFunctions.tokens): DataFrame = {
    require(k >= 1, "need at least one merge")
    require(rewriteEvery >= 1, "rewriteEvery must be positive")
    require(batchMerges >= 1, "batchMerges must be positive")
    val spark = docs.sparkSession
    // the one corpus-sized pass: word occurrence frequencies, folded
    // straight into the initial symbol state
    var base = docs
      .select(explode(tokenize(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), initState(col("w")).as("s"))
      .localCheckpoint()
    var pending = Vector.empty[(String, String)] // merges not yet in base
    def curState = applyMerges(col("s"), pending)
    // the TRUNCATED driver pair table. Invariants:
    //  - pc holds EXACT counts for every retained key;
    //  - every ABSENT key's exact count is ≤ `floor` (0 while the
    //    table is complete);
    //  - `slackOf(key)` marks the rare keys whose recorded count may
    //    UNDERSTATE by at most that bound (same symbol string minted
    //    by two different merges after the key was truncated — the
    //    unknowable base was ≤ the floor at insert time).
    // The selection guard below refuses any argmax these bounds
    // cannot prove global and refills instead.
    val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    var floor = 0L
    // when the floor's tie class is SPLIT on the pinned (lex) order,
    // the lex-smallest EXCLUDED key: every absent pair is then
    // provably pinned-worse than (floorKey, floor), which lets a
    // retained tie-class entry win; None = conservative strict floor
    var floorKey: Option[(String, String)] = None
    val slackOf = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val minted = scala.collection.mutable.HashSet.empty[String]
    // pinned trainer order: count desc, then l asc, r asc
    val pinned = Ordering.by[((String, String), Long), (Long, String, String)] {
      case ((pl, pr), c) => (-c, pl, pr)
    }
    def foldInto(rows: Array[Row],
                 changed: scala.collection.mutable.Set[(String, String)] = null,
                 slackForInserts: Long = 0L): Unit =
      rows.foreach { row =>
        val key = (row.getString(0), row.getString(1))
        val d = row.getLong(2)
        pc.get(key) match {
          case Some(c) =>
            val cnt = c + d
            if (cnt <= 0L) { pc.remove(key); slackOf.remove(key) }
            else pc.update(key, cnt)
            if (changed != null) changed += key
          case None if d > 0L =>
            // positive delta to an absent key: increments only ever
            // touch pairs containing the symbol minted THIS step, so
            // the base count is exactly 0 — except when the same
            // symbol string was minted before (slackForInserts then
            // bounds the truncated base)
            pc.update(key, d)
            if (slackForInserts > 0L) slackOf.update(key, slackForInserts)
            if (changed != null) changed += key
          case None =>
            // negative delta to a truncated key: its exact count only
            // sank further below the floor — the bound stands
            ()
        }
      }
    /** Recount the pair table of the CURRENT state (base + pending)
      * distributed and retain the top of it: the count histogram
      * (distinct counts — tiny) picks the smallest floor whose
      * STRICT survivors fit `maxPairs`, and only survivors are
      * collected — the driver never holds more than maxPairs rows
      * regardless of corpus pair diversity. Clears all slack (the
      * recount is exact). */
    def refill(): Unit = {
      val tbl = base.select(col("freq"), curState.as("s"))
        .select(explode(pairArr(col("s"), col("freq"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("p.d")).as("cnt"))
        .localCheckpoint() // one recount job; histogram + survivors read it
      // top maxPairs+1 histogram classes ONLY (a TakeOrdered, not a
      // full collect): every class holds ≥ 1 key, so the floor walk
      // below can consume at most maxPairs classes before stopping —
      // truncating at maxPairs+1 is exact, and it restores the
      // "driver never holds more than ~maxPairs rows" bound that the
      // full histogram broke (distinct counts grow ~√(2·occurrences),
      // not with maxPairs — a 1e13-occurrence corpus has millions)
      val hist = tbl.groupBy(col("cnt")).agg(count(lit(1)).as("n"))
        .orderBy(col("cnt").desc).limit(maxPairs + 1)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      var kept = 0L
      var idx = 0
      while (idx < hist.length && kept + hist(idx)._2 <= maxPairs) {
        kept += hist(idx)._2; idx += 1
      }
      pc.clear(); slackOf.clear()
      floor = if (idx < hist.length) hist(idx)._1 else 0L
      floorKey = None
      if (kept > 0L)
        tbl.filter(col("cnt") > lit(floor)).collect().foreach { r =>
          pc.update((r.getString(0), r.getString(1)), r.getLong(2))
        }
      if (idx < hist.length) {
        // the floor's tie class is wider than the remaining room —
        // split it on the pinned (lex) order: retain its lex-smallest
        // keys exactly, remember the first excluded one. Guarantees
        // ≥ 1 retained entry that provably beats every absent pair,
        // so a fresh refill can always select (no all-ties deadlock).
        val room = (maxPairs - kept).toInt
        if (room > 0) {
          val tie = tbl.filter(col("cnt") === lit(floor))
            .orderBy(col("l"), col("r")).limit(room + 1).collect()
          tie.take(room).foreach { r =>
            pc.update((r.getString(0), r.getString(1)), r.getLong(2))
          }
          // the class outgrew the room, so the (room+1)-th row exists
          floorKey = Some((tie(room).getString(0), tie(room).getString(1)))
        }
      }
      tbl.unpersist()
      ()
    }
    refill()
    /** TRUE iff the truncation bounds prove `best` is the GLOBAL
      * pinned argmax: it strictly beats the floor (any absent pair)
      * and every slack entry's upper bound, and is not itself slack
      * (its own exact count — reported in the merge table — could be
      * understated). */
    def provenBest(best: ((String, String), Long)): Boolean = {
      val beatsAbsent = best._2 > floor ||
        (best._2 == floor &&
          floorKey.exists(fk => pinned.lt(best, (fk, floor))))
      beatsAbsent && !slackOf.contains(best._1) &&
        slackOf.forall { case (sk, sb) =>
          pinned.lt(best, (sk, pc.getOrElse(sk, 0L) + sb))
        }
    }
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var i = 1
    var exhausted = false
    var aimd = 4 // adaptive batch size: double on full acceptance,
                 // reset to the accepted count on a rejection
    var refilledAt = -1 // merge index of the last refill (loop guard)
    while (i <= k && !exhausted) {
      // truncation guard: the table's pinned-best must be PROVABLY
      // global (see provenBest) — refill once when it is not; a
      // refill that still cannot prove a best means the descent
      // reached the floor with nothing retained above it
      // (the proof is free when the table is complete and slack-free
      // — every retained count is then exact and positive)
      val needRefill = pc.size > maxPairs ||
        ((floor > 0L || slackOf.nonEmpty) &&
          pc.minOption(pinned).forall(b => !provenBest(b)))
      if (needRefill && (pc.nonEmpty || floor > 0L)) {
        require(refilledAt != i,
          s"pair table cannot isolate a provable argmax at merge $i " +
            s"even freshly refilled (floor $floor, ${pc.size} retained) " +
            "— the top of the count distribution is wider than " +
            s"maxPairs $maxPairs; raise maxPairs")
        refill()
        refilledAt = i
      } else if (pc.isEmpty) exhausted = true
      else {
        // ---- guess a batch: the pinned-order TOP-cap of the table.
        // Only the top `cap` entries matter, so a bounded partial
        // selection replaces a full table sort.
        val cap = math.max(1,
          math.min(math.min(aimd, batchMerges), k - i + 1))
        // select top cap+1: the extra entry is the FENCE — every
        // unchanged non-batch pair is pinned-worse than it, so the
        // per-step verification argmax below only has to scan the
        // batch tail plus keys the folded deltas touched, falling back
        // to a full table scan only when nothing beats the fence.
        // Without it, verification is an O(P) scan per ACCEPTED merge
        // — O(k·P) on the driver at real vocabulary scale.
        val top = scala.collection.mutable.PriorityQueue
          .empty[((String, String), Long)](pinned) // max = pinned-LAST
        pc.foreach { e =>
          if (top.size < cap + 1) top.enqueue(e)
          else if (pinned.lt(e, top.head)) { top.dequeue(); top.enqueue(e) }
        }
        // dequeueAll yields priority (pinned-WORST) first
        val drained: Seq[((String, String), Long)] = top.dequeueAll
        val fence = if (drained.length > cap) Some(drained.head) else None
        val batch = drained.toVector.reverse.take(cap).map(e => e._1)
        // ---- ONE job: per-step deltas of applying the batch
        // SEQUENTIALLY. Each state st_j is its own projected column,
        // referenced 3× (next replace, the change probe, the pair
        // explode) so CollapseProject keeps the chain un-inlined and
        // codegen evaluates each replace once per row.
        val pats = batch.map { case (l, r) =>
          (Sep + l + Sep + Sep + r + Sep, Sep + l + r + Sep)
        }
        var df = base.select(col("freq"), curState.as("st0"))
          .filter(pats.map(p => col("st0").contains(lit(p._1))).reduce(_ || _))
        pats.zipWithIndex.foreach { case ((pat, rep), j) =>
          df = df.withColumn(s"st${j + 1}",
            replace(col(s"st$j"), lit(pat), lit(rep)))
        }
        val emptyArr = array().cast(
          "array<struct<l:string,r:string,d:bigint,j:int>>")
        val stepArrs = pats.zipWithIndex.map { case ((pat, _), j) =>
          when(col(s"st$j").contains(lit(pat)),
              concat(pairArrStep(col(s"st$j"), -col("freq"), j),
                pairArrStep(col(s"st${j + 1}"), col("freq"), j)))
            .otherwise(emptyArr)
        }
        val byStep = df
          .select(explode(flatten(array(stepArrs.toSeq: _*))).as("p"))
          .groupBy(col("p.j").as("j"), col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("p.d")).as("cnt"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (j, rs) =>
            j -> rs.map(r => Row(r.getString(1), r.getString(2), r.getLong(3)))
          }
        // ---- verify-and-accept: step j stands only if the EXACT
        // argmax (post steps < j) still equals the guess; the first
        // mismatch discards the tail (its deltas assumed a merge that
        // will not happen). The argmax scans only batch tail + keys
        // the deltas changed, bounded by the selection-time fence
        // (unchanged outsiders cannot beat it; a changed fence is in
        // `changed` and covered); full scan only if the fence wins.
        val changed = scala.collection.mutable.HashSet.empty[(String, String)]
        var j = 0
        var ok = true
        while (j < batch.length && ok && i <= k) {
          if (pc.isEmpty) ok = false
          else {
            val guess = batch(j)
            val candBest = (batch.iterator.drop(j) ++ changed.iterator)
              .flatMap(key => pc.get(key).map(c => (key, c)))
              .minOption(pinned)
            val ((bl, br), cnt) = candBest match {
              case Some(b) if fence.forall(f => pinned.lt(b, f)) => b
              case _ => pc.min(pinned)
            }
            if ((floor > 0L || slackOf.nonEmpty) &&
                !provenBest(((bl, br), cnt))) {
              // mid-batch decrements sank the exact best to where the
              // truncation bounds no longer prove it global — discard
              // the tail; the loop head refills and re-selects
              ok = false
            } else if ((bl, br) == guess) {
              merges += ((i, bl, br, cnt))
              // a symbol string minted TWICE (e.g. (a,bc) and (ab,c)
              // both yield "abc") can resurrect a truncated key with
              // an unknowable base — mark this step's inserts slack
              val dup = !minted.add(bl + br)
              foldInto(byStep.getOrElse(j, Array.empty), changed,
                slackForInserts = if (dup && floor > 0L) floor else 0L)
              pending :+= guess
              i += 1
              j += 1
            } else ok = false
          }
        }
        // growth clamped at the configured cap: unbounded doubling
        // overflows Int after ~29 fully-accepted batches and pins the
        // batch size at 1 for the rest of a real k≈32000 run
        aimd = if (ok) math.min(aimd * 2, batchMerges) else math.max(1, j)
        if (pending.size >= rewriteEvery) {
          base = base.select(col("freq"), curState.as("s")).localCheckpoint()
          pending = Vector.empty
        }
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
    * encoding.
    *
    * DEPTH BOUND: the k replaces nest into ONE expression tree, and a
    * real-vocabulary k (≈ 32 000) overflows the JVM's 64 KB method
    * limit in generated code — Spark then silently degrades to
    * interpreted eval. Callers applying more than a few hundred
    * merges must segment the fold and materialize between segments;
    * [[encodeTokenCounts]] does exactly that (`chunk`), and the
    * trainer's lazy-rewrite cadence (`rewriteEvery` + one batch)
    * keeps its own chains far below the bound. */
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
    * shuffle.
    *
    * Real-vocabulary merge tables are applied in `chunk`-sized
    * segments with the vocab-sized state materialized between them
    * ([[applyMerges]]'s depth bound — k ≈ 32 000 chained replaces in
    * one tree would fall out of codegen); tables at or below `chunk`
    * take the exact single-plan path of earlier rounds. */
  def encodeTokenCounts(docs: DataFrame, textCol: String,
                        merges: Seq[(String, String)],
                        chunk: Int = 256): DataFrame = {
    require(chunk >= 1, "chunk must be positive")
    var st = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), initState(col("w")).as("s"))
    val groups = merges.grouped(chunk).toSeq
    groups.zipWithIndex.foreach { case (g, gi) =>
      st = st.select(col("freq"), applyMerges(col("s"), g).as("s"))
      if (gi < groups.length - 1) st = st.localCheckpoint()
    }
    st.select(col("freq"), explode(syms(col("s"))).as("token"))
      .groupBy(col("token")).agg(sum(col("freq")).as("cnt"))
  }
}
