package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    assemble(ls.join(common, Seq("line"), "left"), idCol)
  }

  /** Reassemble marked lines (id, pos, line, is_common ∈ {true,null})
    * into one row per document: surviving lines re-joined in position
    * order, plus the count of removed occurrences. Doc-keyed shuffle;
    * collect_list is document-sized. */
  private def assemble(marked: DataFrame, idCol: String): DataFrame =
    marked.groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(
            when(col("is_common").isNull, struct(col("pos"), col("line"))))),
          x => x("line")), "\n").as("clean_text"),
        count(col("is_common")).as("n_removed"))

  /** Clean `docs` against an EXPLICIT boilerplate dictionary `dict`
    * (one `line` column) — the serving half of the incremental store:
    * dictionary broadcast (boilerplate-sized by construction), one
    * map-side mark join, one doc-keyed shuffle to reassemble. */
  def cleanWithDict(docs: DataFrame, idCol: String, textCol: String,
                    dict: DataFrame): DataFrame =
    assemble(
      lines(docs, idCol, textCol).join(
        broadcast(dict.select(col("line")).distinct()
          .withColumn("is_common", lit(true))),
        Seq("line"), "left"),
      idCol)

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

  // ---------------------------------------------------------------
  // Incremental boilerplate ingest (c5). Unlike every other ingest
  // family in this repo, the common-line predicate is NOT stable for
  // already-emitted documents: a line can cross the minDocs threshold
  // in a LATER batch, retroactively making earlier cleaned output
  // wrong. The store therefore emits a CHANGELOG — each fold returns
  // its batch's cleaned docs PLUS re-emissions of every stored doc
  // invalidated by a threshold crossing — and latest-emission-per-doc
  // across all folds equals the full removeCommonLines recompute
  // bit-exactly (the gate). Monotone corpus growth makes the
  // dictionary monotone (nd only grows), which bounds the machinery:
  //  * `pairs`  — (line, doc_id) distinct pairs for SUB-threshold
  //    lines only, partitioned by crc32(line) mod nBuckets. A line in
  //    the dictionary never returns to the candidate path, so every
  //    stored line carries < minDocs pairs: the store is
  //    O(minDocs × candidate lines), and a fold's pruned+semi-joined
  //    read is O(minDocs × batch candidate lines) — mega boilerplate
  //    lines never re-join the pair store after crossing.
  //  * `docs`   — (doc_id, text) partitioned by doc_id mod
  //    nDocBuckets, read back ONLY for invalidated ids (static
  //    partition filter + isin; ≤ (minDocs-1) × crossed lines ids,
  //    collected driver-side — the q91 bounded-set economics).
  //  * `dict`   — append-only crossed lines; the serving dictionary.
  // ---------------------------------------------------------------

  private def metaPath(path: String): String = s"${path}_meta"

  private def writeMeta(spark: SparkSession, path: String, maxDoc: Long,
                        minDocs: Long, nBuckets: Int, nDocBuckets: Int,
                        mode: String): Unit = {
    import spark.implicits._
    Seq((maxDoc, minDocs, nBuckets, nDocBuckets))
      .toDF("max_doc", "min_docs", "n_buckets", "n_doc_buckets")
      .coalesce(1)
      .write.mode(mode).parquet(metaPath(path))
  }

  /** Validate layout params against the store's meta (the d26/q92
    * loud-mismatch discipline — a silently different minDocs or
    * bucket count mis-prunes or mis-thresholds with no error) and
    * return the ingest high-water mark. */
  private[graft] def readMeta(spark: SparkSession, path: String,
                              minDocs: Long, nBuckets: Int,
                              nDocBuckets: Int): Long = {
    val rows = spark.read.parquet(metaPath(path)).collect()
    require(rows.nonEmpty, s"no _meta at ${metaPath(path)}")
    rows.foreach { meta =>
      require(meta.getAs[Long]("min_docs") == minDocs &&
          meta.getAs[Int]("n_buckets") == nBuckets &&
          meta.getAs[Int]("n_doc_buckets") == nDocBuckets,
        s"store layout mismatch: built with " +
          s"(minDocs=${meta.getAs[Long]("min_docs")}, " +
          s"nBuckets=${meta.getAs[Int]("n_buckets")}, " +
          s"nDocBuckets=${meta.getAs[Int]("n_doc_buckets")}), called with " +
          s"(minDocs=$minDocs, nBuckets=$nBuckets, nDocBuckets=$nDocBuckets)")
    }
    rows.map(_.getAs[Long]("max_doc")).max
  }

  private def pairBucket(line: Column, nBuckets: Int): Column =
    pmod(crc32(line), lit(nBuckets.toLong))

  /** Driver-side twin of [[pairBucket]] (crc32 is bit-identical in
    * the JVM, Spark, and DuckDB — the q92 store's reason for choosing
    * it): lets specs and maintenance code map a line to its bucket
    * without a Spark job. */
  private[graft] def bucketOf(line: String, nBuckets: Int): Long = {
    val c = new java.util.zip.CRC32
    val b = line.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    c.update(b, 0, b.length)
    java.lang.Math.floorMod(c.getValue, nBuckets.toLong)
  }

  private def docBucket(id: Column, nDocBuckets: Int): Column =
    pmod(id, lit(nDocBuckets.toLong))

  /** The fold's pruned pair-store read — `private[graft]` so the spec
    * asserts the static `bucket IN (…)` partition filter on exactly
    * the production scan (inside the fold it is consumed by an
    * eagerly checkpointed join and never appears in a returned
    * plan). */
  private[graft] def pairStoreRows(spark: SparkSession, path: String,
                                   buckets: Seq[Long]): DataFrame =
    spark.read.parquet(s"$path/pairs")
      .filter(if (buckets.isEmpty) lit(false)
              else col("bucket").isin(buckets: _*))

  /** Initialize the incremental boilerplate store from a corpus and
    * return the corpus's cleaned output (== [[removeCommonLines]]
    * over `docs`). */
  def buildStore(docs: DataFrame, idCol: String, textCol: String,
                 minDocs: Long, path: String, nBuckets: Int = 64,
                 nDocBuckets: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    val pairs = lines(docs, idCol, textCol)
      .select(col("line"), col(idCol).as("doc_id")).distinct()
    val nd = pairs.groupBy(col("line")).agg(count(lit(1)).as("nd"))
      .localCheckpoint() // feeds dict write, pair filter, and nothing else twice
    val dict = nd.filter(col("nd") >= minDocs).select(col("line"))
    dict.write.mode("overwrite").parquet(s"$path/dict")
    // sub-threshold pairs only; bucket-aligned so the store is
    // nBuckets files, not shufflePartitions × nBuckets
    pairs.join(nd.filter(col("nd") < minDocs).select(col("line")),
        Seq("line"), "left_semi")
      .withColumn("bucket", pairBucket(col("line"), nBuckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/pairs")
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("dbucket", docBucket(col("doc_id"), nDocBuckets))
      .repartition(col("dbucket"))
      .write.mode("overwrite").partitionBy("dbucket").parquet(s"$path/docs")
    val mr = docs.agg(max(col(idCol)).cast("long")).head()
    val maxDoc = if (mr.isNullAt(0)) Long.MinValue else mr.getLong(0)
    writeMeta(spark, path, maxDoc, minDocs, nBuckets, nDocBuckets, "overwrite")
    cleanWithDict(docs, idCol, textCol,
      spark.read.parquet(s"$path/dict"))
  }

  /** One fold's full computation against the LIVE store WITHOUT
    * mutating it — factored out of [[fold]] so the streaming twin can
    * stage every artifact under the committed-staging exactly-once
    * protocol before anything touches the live layout. Returns
    * `(pairsDelta, docsAppend, dictAppend, newMaxDoc, changelog)`;
    * every returned frame is either eagerly checkpointed or derives
    * only from checkpointed frames and the input batch, so none
    * re-reads the store after the caller starts mutating it. */
  private[graft] def computeFold(spark: SparkSession, path: String,
                                 batch: DataFrame, idCol: String,
                                 textCol: String, minDocs: Long,
                                 nBuckets: Int, nDocBuckets: Int):
      (DataFrame, DataFrame, DataFrame, Long, DataFrame) = {
    val prevMax = readMeta(spark, path, minDocs, nBuckets, nDocBuckets)
    val mm = batch.agg(min(col(idCol)).cast("long"),
      max(col(idCol)).cast("long")).head()
    require(!mm.isNullAt(0) && mm.getLong(0) > prevMax,
      s"monotonic-ingest contract: batch min doc id " +
        s"${if (mm.isNullAt(0)) "(empty)" else mm.getLong(0)} must exceed " +
        s"stored max $prevMax")
    // snapshot the dictionary BEFORE any mutation (eager — the
    // returned frames must not re-list the dict path after the
    // crossed-lines append below)
    val dict0 = spark.read.parquet(s"$path/dict").localCheckpoint()
    val bpairs = lines(batch, idCol, textCol)
      .select(col("line"), col(idCol).as("doc_id")).distinct()
      .localCheckpoint() // feeds candidate agg + delta write
    // candidate lines = batch lines not yet in the dictionary (a
    // dict line's count can never matter again — monotone)
    val candAgg = bpairs
      .join(broadcast(dict0), Seq("line"), "left_anti")
      .groupBy(col("line")).agg(count(lit(1)).as("ndb"))
      .localCheckpoint()
    val buckets = candAgg
      .select(pairBucket(col("line"), nBuckets).as("bucket"))
      .distinct().collect().map(_.getLong(0)).sorted
    // stored pairs of candidate lines: ≤ (minDocs-1) rows per line
    val storedPairs = pairStoreRows(spark, path, buckets.toIndexedSeq)
      .join(candAgg.select(col("line")), Seq("line"), "left_semi")
      .localCheckpoint()
    val crossed = candAgg
      .join(storedPairs.groupBy(col("line")).agg(count(lit(1)).as("nd0")),
        Seq("line"), "left")
      .filter(coalesce(col("nd0"), lit(0L)) + col("ndb") >= minDocs)
      .select(col("line"))
      .localCheckpoint()
    val dictNew = dict0.unionByName(crossed).distinct().localCheckpoint()
    // invalidated stored docs: carriers of a crossed line. Bounded
    // driver-side set (< minDocs ids per crossed line).
    val invIds = storedPairs
      .join(crossed, Seq("line"), "left_semi")
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val outInv =
      if (invIds.isEmpty) None
      else {
        val dbuckets = invIds.map(_ % nDocBuckets).distinct.map(java.lang.Long.valueOf)
        val inv = spark.read.parquet(s"$path/docs")
          .filter(col("dbucket").isin(dbuckets: _*) &&
            col("doc_id").isin(invIds.map(java.lang.Long.valueOf): _*))
          .select(col("doc_id"), col("text"))
          .localCheckpoint() // snapshot before the doc-store append below
        Some(cleanWithDict(inv, "doc_id", "text", dictNew)
          .withColumnRenamed("doc_id", idCol))
      }
    val pairsDelta = bpairs.join(broadcast(dictNew), Seq("line"), "left_anti")
      .withColumn("bucket", pairBucket(col("line"), nBuckets))
    val docsApp = batch.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("dbucket", docBucket(col("doc_id"), nDocBuckets))
    val outBatch = cleanWithDict(batch, idCol, textCol, dictNew)
    val changelog = outInv.map(outBatch.unionByName(_)).getOrElse(outBatch)
    (pairsDelta, docsApp, crossed, mm.getLong(1), changelog)
  }

  /** Fold a monotonic document batch into a [[buildStore]] layout and
    * return the changelog emission: the batch cleaned under the
    * updated dictionary, PLUS re-emissions of every stored document a
    * threshold crossing invalidated. Latest emission per doc across
    * build + folds equals the full [[removeCommonLines]] recompute
    * bit-exactly — the c5 gate. The corpus is never rescanned: the
    * pair store is read bucket-pruned and semi-joined to the batch's
    * candidate lines (< minDocs rows per line by the store invariant)
    * and the doc store only for the bounded invalidated-id set.
    * Crash-redo contract as d26; the streaming twin (s16) wraps
    * [[computeFold]] in the committed-staging exactly-once protocol
    * instead. */
  def fold(spark: SparkSession, path: String, batch: DataFrame,
           idCol: String, textCol: String, minDocs: Long,
           nBuckets: Int = 64, nDocBuckets: Int = 64): DataFrame = {
    val (pairsDelta, docsApp, dictApp, newMax, changelog) =
      computeFold(spark, path, batch, idCol, textCol, minDocs,
        nBuckets, nDocBuckets)
    pairsDelta.repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/pairs")
    docsApp.repartition(col("dbucket"))
      .write.mode("append").partitionBy("dbucket").parquet(s"$path/docs")
    dictApp.write.mode("append").parquet(s"$path/dict")
    writeMeta(spark, path, newMax, minDocs, nBuckets, nDocBuckets, "append")
    changelog
  }
}
