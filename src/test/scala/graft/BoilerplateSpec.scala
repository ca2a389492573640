package graft

import org.apache.spark.sql.functions._
import graft.operators.Boilerplate

/** Boilerplate removal cuts EVERY occurrence of a cross-doc common
  * line (unlike paragraph dedup's keep-first), preserves in-doc order,
  * and keeps fully-boilerplate docs as empty rows; repetition signals
  * count within-doc duplicates only. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "cookie banner\nalpha beta\ngamma\ncookie banner"),
    (2L, "cookie banner\ndelta"),
    (3L, "cookie banner\nalpha beta"),
    (4L, "cookie banner"), // becomes empty after removal
    (5L, "solo line\nsolo line\nunique tail") // in-doc dup, not cross-doc
  ).toDF("doc_id", "text")

  test("removeCommonLines cuts every occurrence and keeps empty docs") {
    val byId = Boilerplate.removeCommonLines(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(byId(1L) === (("alpha beta\ngamma", 2L)), "both occurrences cut")
    assert(byId(2L) === (("delta", 1L)))
    assert(byId(3L) === (("alpha beta", 1L)))
    assert(byId(4L) === (("", 1L)), "all-boilerplate doc stays, empty")
    assert(byId(5L) === (("solo line\nsolo line\nunique tail", 0L)),
      "2-doc... in-doc dup below minDocs distinct docs is untouched")
  }

  test("shuffle-join path (broadcastCommon=false) is identical") {
    val a = Boilerplate.removeCommonLines(docs, "doc_id", "text", 3, broadcastCommon = true)
    val b = Boilerplate.removeCommonLines(docs, "doc_id", "text", 3, broadcastCommon = false)
    assert(a.collect().toSet === b.collect().toSet)
  }

  test("lineRepetition fractions") {
    val got = Boilerplate.lineRepetition(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // doc 1: 4 lines, 'cookie banner' ×2 → dup_line_frac 2/4
    assert(got(1L)._1 === 4L)
    assert(got(1L)._2 === 0.5)
    // chars: dup 13*2=26, total 26+10+5=41
    assert(got(1L)._3 === 26.0 / 41.0)
    assert(got(2L) === ((2L, 0.0, 0.0)))
    // doc 5: 3 lines, 'solo line' ×2
    assert(got(5L)._1 === 3L)
    assert(got(5L)._2 === 2.0 / 3.0)
  }
}
