package graft

import org.apache.spark.sql.functions._
import graft.operators.Pack

/** q97 sequence packing with document splitting: stream-coverage
  * invariants and the two-phase prefix sum's shard-independence —
  * the span map must be a pure function of (doc order, token counts,
  * seqLen), with `docsPerShard` affecting only the plan. */
class PackSpec extends SparkSpec {
  import spark.implicits._

  // 120 docs: counts cycle 0..29 (zeros must vanish), plus one
  // mega-doc spanning many sequences
  private def fixture = (0L until 120L).map { i =>
    (i, if (i == 50L) 1000L else i % 30)
  }.toDF("doc_id", "n_tokens")

  test("spans cover the token stream exactly; sequences are full except the last") {
    val spans = Pack.packSpans(fixture, "doc_id", col("n_tokens"),
      seqLen = 64, docsPerShard = 16).persist()
    // per-doc coverage: spans of a doc tile [0, n) without gap/overlap
    val perDoc = spans.groupBy($"doc_id")
      .agg(sum($"tok_end" - $"tok_start").as("covered"),
        min($"tok_start").as("lo"), max($"tok_end").as("hi"),
        count(lit(1)).as("nspans"))
      .join(fixture.filter($"n_tokens" > 0), Seq("doc_id"), "full")
    assert(perDoc.filter($"covered".isNull || $"n_tokens".isNull ||
      $"covered" =!= $"n_tokens" || $"lo" =!= 0L ||
      $"hi" =!= $"n_tokens").count() == 0,
      "every non-empty doc's spans must tile [0, n) exactly")
    // the mega-doc spans many sequences
    assert(spans.filter($"doc_id" === 50L).count() >= 1000 / 64)
    // per-sequence fill: seqLen tokens everywhere except the last
    val perSeq = spans.groupBy($"seq_id")
      .agg(sum($"tok_end" - $"tok_start").as("fill")).persist()
    val lastSeq = perSeq.agg(max($"seq_id")).head().getLong(0)
    assert(perSeq.filter($"seq_id" =!= lastSeq && $"fill" =!= 64L)
      .count() == 0, "every sequence but the last must hold exactly seqLen")
    val total = fixture.agg(sum($"n_tokens")).head().getLong(0)
    assert(perSeq.agg(sum($"fill")).head().getLong(0) == total)
    // sequence ids are dense from 0
    assert(perSeq.count() == lastSeq + 1)
    spans.unpersist(); perSeq.unpersist()
  }

  test("length batches: full batches, monotone lengths, padding beats arrival order") {
    import org.apache.spark.sql.expressions.Window
    val batches = Pack.lengthBatches(fixture, "doc_id", col("n_tokens"),
      batchSize = 8, targetDocsPerShard = 40).persist()
    // doc conservation and batch fill: every batch but each shard's
    // last holds exactly batchSize docs
    assert(batches.agg(sum($"n_docs")).head().getLong(0) ==
      fixture.count())
    val lastPerShard = batches.groupBy($"shard")
      .agg(max($"batch_id").as("last_b"))
    assert(batches.join(lastPerShard, Seq("shard"))
      .filter($"batch_id" =!= $"last_b" && $"n_docs" =!= 8L)
      .count() == 0, "only a shard's last batch may run short")
    // sorted by length => max_len non-decreasing across a shard's batches
    val wS = Window.partitionBy($"shard").orderBy($"batch_id")
    assert(batches.withColumn("prev", lag($"max_len", 1).over(wS))
      .filter($"prev".isNotNull && $"max_len" < $"prev").count() == 0,
      "batch max lengths must be monotone within a shard")
    // the point of length bucketing: total padding is no worse than
    // batching in arrival (doc_id) order under the same shards
    def paddingWithOrder(by: Seq[org.apache.spark.sql.Column]): Long = {
      val n = fixture.agg(count(lit(1)).cast("long").as("nt"))
      val t = fixture.select($"doc_id", $"n_tokens".cast("long").as("n"))
        .crossJoin(broadcast(n))
        .withColumn("n_shards", greatest(expr("(nt + 39) div 40"), lit(1L)))
        .withColumn("shard", pmod(
          graft.functions.TextFunctions.hash32($"doc_id".cast("string"), 3),
          $"n_shards"))
      val w = Window.partitionBy($"shard").orderBy(by: _*)
      t.withColumn("rn", row_number().over(w))
        .withColumn("b", expr("(rn - 1) div 8"))
        .groupBy($"shard", $"b")
        .agg((count(lit(1)) * max($"n") - sum($"n")).as("pad"))
        .agg(sum($"pad")).head().getLong(0)
    }
    val sortedPad = batches.agg(sum($"padding")).head().getLong(0)
    assert(sortedPad == paddingWithOrder(Seq($"n".asc, $"doc_id".asc)))
    assert(sortedPad <= paddingWithOrder(Seq($"doc_id".asc)),
      "length-sorted batching must not pad more than arrival order")
    batches.unpersist()
  }

  test("the span map is shard-independent (two-phase prefix sum correctness)") {
    val byOne = Pack.packSpans(fixture, "doc_id", col("n_tokens"), 64,
      docsPerShard = 1)
    val bySeven = Pack.packSpans(fixture, "doc_id", col("n_tokens"), 64,
      docsPerShard = 7)
    val byAll = Pack.packSpans(fixture, "doc_id", col("n_tokens"), 64,
      docsPerShard = 1000000)
    assert(byOne.exceptAll(bySeven).isEmpty && bySeven.exceptAll(byOne).isEmpty)
    assert(byAll.exceptAll(bySeven).isEmpty && bySeven.exceptAll(byAll).isEmpty)
  }

  test("duplicate doc ids fail loudly instead of packing nondeterministically") {
    // equal ids share a shard and sort adjacent, so the in-window
    // guard must see them with no extra exchange
    val dup = Seq((1L, 5L), (1L, 7L), (2L, 3L)).toDF("doc_id", "n_tokens")
    val e = intercept[Exception] {
      Pack.packSpans(dup, "doc_id", col("n_tokens"), seqLen = 4,
        docsPerShard = 16).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("unique doc ids")))
    // and the guard is free for unique ids: same results as before
    val spans = Pack.packSpans(fixture, "doc_id", col("n_tokens"), 64,
      docsPerShard = 16)
    assert(spans.agg(sum($"tok_end" - $"tok_start")).head().getLong(0) ==
      fixture.agg(sum($"n_tokens")).head().getLong(0))
  }
}
