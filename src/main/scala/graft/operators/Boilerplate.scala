package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-granular corpus cleaning and quality signals — the CCNet /
  * Gopher preprocessing stages of an LLM data pipeline (reference
  * capability class: corpus preparation; cf. the paragraph-granular
  * [[DedupSuite.dedupParagraphs]], which KEEPS one occurrence — these
  * operators target boilerplate, which is removed everywhere, and
  * within-document repetition, which is scored, not cut).
  *
  * 100-TB economics: both operators are two-shuffle pipelines. Lines
  * shuffle once on the line key (partial-aggregated — the map side
  * combines duplicate lines before the exchange) and once on doc_id
  * for per-document assembly. Nothing is corpus-sized on the driver;
  * the only optional driver-sized object is the broadcast boilerplate
  * set, bounded by construction (a line must appear in ≥ `minDocs`
  * distinct documents, so the set holds at most nDocs·meanLines /
  * minDocs entries, and in practice boilerplate is a tiny dictionary). */
object Boilerplate {

  private def lines(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))

  /** CCNet-style cross-document boilerplate removal: a line whose text
    * occurs in at least `minDocs` DISTINCT documents is dropped from
    * EVERY document (cookie banners, subscribe footers, nav chrome);
    * remaining lines are re-joined in original order. Output:
    * (id, clean_text, n_removed) — one row per input document, empty
    * string when every line was boilerplate.
    *
    * `broadcastCommon` (default true) broadcasts the boilerplate
    * dictionary — one corpus shuffle total. With false, the mark join
    * runs as a shuffle join that REUSES the line-key exchange the
    * count pass already paid (same child subplan → ReusedExchange),
    * for corpora whose common-line set outgrows the driver. */
  def removeCommonLines(docs: DataFrame, idCol: String, textCol: String,
                        minDocs: Long,
                        broadcastCommon: Boolean = true): DataFrame = {
    val ls = lines(docs, idCol, textCol)
    val common0 = ls.groupBy(col("line"))
      .agg(count_distinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("line"), lit(true).as("is_common"))
    val common = if (broadcastCommon) broadcast(common0) else common0
    ls.join(common, Seq("line"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(
            when(col("is_common").isNull, struct(col("pos"), col("line"))))),
          x => x("line")), "\n").as("clean_text"),
        count(col("is_common")).as("n_removed"))
  }

  /** Gopher-style within-document line repetition signals: for each
    * document, the number of lines, the fraction of lines that are
    * occurrences of a line duplicated WITHIN the document, and the
    * same fraction weighted by characters. Repetition-heavy documents
    * (chat logs, scraped tickers, SEO spam) score high and get
    * filtered upstream of training. Output:
    * (id, n_lines, dup_line_frac, dup_char_frac). */
  def lineRepetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def frac(num: Column, den: Column): Column =
      when(den === 0L, lit(0.0))
        .otherwise(num.cast("double") / den.cast("double"))
    lines(docs, idCol, textCol)
      .groupBy(col(idCol), col("line"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum(col("c")).as("n"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup"),
        sum(length(col("line")) * col("c")).as("chars"),
        sum(when(col("c") > 1, length(col("line")) * col("c"))
          .otherwise(lit(0L))).as("dupchars"))
      .select(col(idCol),
        col("n").cast("bigint").as("n_lines"),
        frac(col("dup"), col("n")).as("dup_line_frac"),
        frac(col("dupchars"), col("chars")).as("dup_char_frac"))
  }
}
