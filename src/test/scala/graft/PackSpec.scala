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
}
