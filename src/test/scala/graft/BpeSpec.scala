package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe

/** BPE merge training must equal the reference sequential algorithm —
  * including greedy left-to-right merge application on overlapping
  * runs, deterministic tie-breaks, and vocabulary saturation. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE on a word-frequency table: index-greedy merge
    * application (the textbook form), independent of the operator's
    * delimited-string replace encoding. */
  private def refBpe(wordFreq: Seq[(String, Long)],
                     k: Int): Seq[(Int, String, String, Long)] = {
    def applyMerge(syms: Vector[String], l: String,
                   r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
          out += (l + r); j += 2
        } else { out += syms(j); j += 1 }
      }
      out.result()
    }
    var st = wordFreq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var i = 1
    var stop = false
    while (i <= k && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- st; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) += f
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), cnt) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((i, l, r, cnt))
        st = st.map { case (syms, f) => (applyMerge(syms, l, r), f) }
        i += 1
      }
    }
    out.toList
  }

  private def run(docs: Seq[String], k: Int): Seq[(Int, String, String, Long)] =
    Bpe.bpeTrain(docs.toDF("text"), "text", k)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  private def runInc(docs: Seq[String], k: Int,
                     rewriteEvery: Int = 3,
                     batchMerges: Int = 64,
                     maxPairs: Int = 1 << 22): Seq[(Int, String, String, Long)] =
    Bpe.bpeTrainIncremental(docs.toDF("text"), "text", k, rewriteEvery,
        maxPairs = maxPairs, batchMerges = batchMerges)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  private def refFromDocs(docs: Seq[String],
                          k: Int): Seq[(Int, String, String, Long)] = {
    val freq = docs.flatMap(_.toLowerCase.split("[^a-z0-9]+"))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }.toSeq
    refBpe(freq, k)
  }

  test("matches the reference algorithm on a mixed corpus") {
    val docs = Seq(
      "the cat sat on the mat", "the dog sat on the log",
      "lower lowest low", "newer newest new", "the the them theme",
      "hugging tugging jogging", "a ab abc abcd abcde")
    assert(run(docs, 12) === refFromDocs(docs, 12))
  }

  test("greedy left-to-right application on overlapping runs") {
    // 'aaa': after merge (a,a) the state must be [aa, a] — the replace
    // encoding and the index-greedy reference must agree on runs
    val docs = Seq("aaa aaa aaaa aaaaa baaab")
    assert(run(docs, 6) === refFromDocs(docs, 6))
  }

  test("deterministic tie-break: count desc, then left asc, right asc") {
    // 'ab' and 'cd' both appear exactly 3 times as pairs — (a,b) wins
    val docs = Seq("ab ab ab cd cd cd")
    val got = run(docs, 2)
    assert(got === refFromDocs(docs, 2))
    assert(got.head._2 == "a" && got.head._3 == "b")
  }

  test("saturation stops early with fewer than k merges") {
    val docs = Seq("a b c a b c")
    val got = run(docs, 10)
    assert(got === refFromDocs(docs, 10))
    assert(got.isEmpty, "single-char vocabulary has no pairs to merge")
  }

  test("incremental trainer equals the recount trainer and the reference") {
    val docs = Seq(
      "the cat sat on the mat", "the dog sat on the log",
      "lower lowest low", "newer newest new", "the the them theme",
      "hugging tugging jogging", "a ab abc abcd abcde",
      "aaa aaa aaaa aaaaa baaab", "ab ab ab cd cd cd")
    // rewriteEvery straddling, dividing, and exceeding k — the lazy
    // state rewrite must never change the merge table
    for (re <- Seq(1, 3, 100)) {
      assert(runInc(docs, 14, rewriteEvery = re) === refFromDocs(docs, 14))
    }
    assert(runInc(docs, 14) === run(docs, 14))
  }

  test("incremental trainer: overlapping runs and saturation") {
    assert(runInc(Seq("aaa aaa aaaa aaaaa baaab"), 6) ===
      refFromDocs(Seq("aaa aaa aaaa aaaaa baaab"), 6))
    val got = runInc(Seq("a b c a b c"), 10)
    assert(got.isEmpty, "single-char vocabulary has no pairs to merge")
  }

  test("incremental trainer: randomized property vs reference") {
    // deterministic pseudo-random corpora (seeded) — many small
    // vocabularies with heavy pair collisions and ties; batchMerges
    // sweeps from per-merge (1) through full-batch guessing, so the
    // verify-and-accept protocol is exercised at every cadence
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 1 to 5) {
      val alphabet = "abcd"
      val docs = (1 to 40).map { _ =>
        (1 to (1 + rnd.nextInt(5))).map { _ =>
          (1 to (1 + rnd.nextInt(6)))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        }.mkString(" ")
      }
      val k = 1 + rnd.nextInt(12)
      assert(runInc(docs, k, rewriteEvery = 1 + rnd.nextInt(6),
        batchMerges = 1 + rnd.nextInt(8)) === refFromDocs(docs, k))
    }
  }

  test("truncated pair table: tiny maxPairs still equals the reference exactly") {
    // maxPairs far below the corpora's pair diversity forces the
    // floor-bounded truncation and its refills on every descent —
    // the merge table (counts included) must stay bit-identical to
    // the complete-table reference at every bound
    val docs = Seq(
      "the cat sat on the mat", "the dog sat on the log",
      "lower lowest low", "newer newest new", "the the them theme",
      "hugging tugging jogging", "a ab abc abcd abcde",
      "aaa aaa aaaa aaaaa baaab", "ab ab ab cd cd cd")
    for (mp <- Seq(2, 3, 8)) {
      assert(runInc(docs, 14, maxPairs = mp) === refFromDocs(docs, 14),
        s"maxPairs=$mp")
    }
    // randomized: heavy ties + truncation + batch sweep together
    val rnd = new scala.util.Random(20260816L)
    for (_ <- 1 to 4) {
      val alphabet = "abcde"
      val corpus = (1 to 30).map { _ =>
        (1 to (1 + rnd.nextInt(5))).map { _ =>
          (1 to (1 + rnd.nextInt(6)))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        }.mkString(" ")
      }
      val k = 1 + rnd.nextInt(10)
      assert(runInc(corpus, k, rewriteEvery = 1 + rnd.nextInt(4),
          batchMerges = 1 + rnd.nextInt(8),
          maxPairs = 2 + rnd.nextInt(6)) === refFromDocs(corpus, k),
        s"k=$k")
    }
  }

  test("batched guessing: a merge-promoted pair forces rejection of a disjoint guess") {
    // counts: (a,b)=102 > (x,a)=100 > (c,d)=50. The batch scan takes
    // (a,b), stops (x,a) on the shared symbol, takes the DISJOINT
    // (c,d) — but merging (a,b) creates (x,ab)=100, which the true
    // greedy picks BEFORE (c,d). The driver's verify step must reject
    // the (c,d) guess and re-select; the final table must equal the
    // reference exactly.
    val docs = Seq(
      (("xab " * 100) + ("ab " * 2) + ("cd " * 50)).trim)
    val ref = refFromDocs(docs, 5)
    assert(ref.map(m => (m._2, m._3)).take(2) === Seq(("a", "b"), ("x", "ab")),
      "fixture must actually promote (x,ab) above (c,d) after merge 1")
    for (bm <- Seq(2, 4, 64); re <- Seq(1, 2, 100)) {
      assert(runInc(docs, 5, rewriteEvery = re, batchMerges = bm) === ref,
        s"batchMerges=$bm rewriteEvery=$re")
    }
  }

  test("chunked encoding equals the single-plan form across chunk boundaries") {
    val train = Seq(
      "the cat sat on the mat", "the dog sat on the log",
      "lower lowest low", "hugging tugging jogging")
    val merges = run(train, 9).map(m => (m._2, m._3))
    val docs = train ++ Seq("loth thug mats unseenword zzz the")
    val whole = Bpe.encodeTokenCounts(docs.toDF("text"), "text", merges)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    for (chunk <- Seq(1, 2, 4, 9, 100)) {
      val got = Bpe.encodeTokenCounts(docs.toDF("text"), "text", merges,
          chunk = chunk)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got === whole, s"chunk=$chunk")
    }
  }

  /** Reference encode: index-greedy application of the merge list in
    * rank order, counting emitted symbols per occurrence. */
  private def refEncodeCounts(docs: Seq[String],
                              merges: Seq[(String, String)]): Map[String, Long] = {
    def applyMerge(syms: Vector[String], l: String,
                   r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
          out += (l + r); j += 2
        } else { out += syms(j); j += 1 }
      }
      out.result()
    }
    docs.flatMap(_.toLowerCase.split("[^a-z0-9]+")).filter(_.nonEmpty)
      .flatMap { w =>
        merges.foldLeft(w.map(_.toString).toVector) {
          case (st, (l, r)) => applyMerge(st, l, r)
        }
      }
      .groupBy(identity).map { case (t, ts) => (t, ts.size.toLong) }
  }

  test("encode matches per-occurrence reference encoding, including unseen words") {
    val train = Seq(
      "the cat sat on the mat", "the dog sat on the log",
      "lower lowest low", "hugging tugging jogging")
    val merges = run(train, 8).map(m => (m._2, m._3))
    // encode a corpus containing words NEVER seen in training — merges
    // still apply to their character runs
    val docs = train ++ Seq("loth thug mats unseenword zzz the")
    val got = Bpe.encodeTokenCounts(docs.toDF("text"), "text", merges)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === refEncodeCounts(docs, merges))
  }

  test("encode with no merges is character counting") {
    val docs = Seq("ab ba", "abc")
    val got = Bpe.encodeTokenCounts(docs.toDF("text"), "text", Nil)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("a" -> 3L, "b" -> 3L, "c" -> 1L))
  }
}
