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

  private[graft] def lines(docs: DataFrame, idCol: String, textCol: String): DataFrame =
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
  // dictionary monotone (nd only grows), which bounds the machinery.
  // Detection and lookup are split into TWO stores because their
  // access patterns differ by orders of magnitude:
  //  * `counts` — additive (line, nd_delta) rows for SUB-threshold
  //    lines, partitioned by crc32(line) mod nBuckets; readers sum
  //    deltas per line (the q92 mergeable-summary move). Crossing
  //    detection joins the batch's candidate lines against this scan
  //    — a batch's lines spread over every bucket, so this read is
  //    honestly corpus-distinct-lines-sized, but NARROW (no doc ids,
  //    no text) and semi-join-filtered.
  //  * `pairs`  — (line, doc_id) distinct pairs for sub-threshold
  //    lines, same partitioning. Read ONLY for lines that actually
  //    CROSSED this fold — a handful of lines in a handful of
  //    buckets, so the static `bucket IN (…)` partition filter here
  //    genuinely prunes (unlike detection, where candidates hash
  //    everywhere). A dictionary line never returns to the candidate
  //    path, so every stored line carries < minDocs pairs.
  //  * `docs`   — (doc_id, text) partitioned by doc_id mod
  //    nDocBuckets, read back ONLY for invalidated ids: a static
  //    dbucket partition filter (≤ nDocBuckets values collected —
  //    the q91 bounded-set economics) plus a broadcast semi-join on
  //    the id set (≤ (minDocs-1) × crossed lines ids, distributed).
  //  * `dict`   — append-only crossed lines; the serving dictionary.
  //    Crossed lines' dead counts/pairs rows are never read again
  //    (the candidate path excludes dictionary lines) — compaction
  //    may drop them.
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

  /** The fold's pruned pair-store read — only ever called with the
    * CROSSED lines' buckets (a handful), so the static `bucket IN (…)`
    * partition filter genuinely prunes. `private[graft]` so the spec
    * asserts the filter on exactly the production scan (inside the
    * fold it is consumed by an eagerly collected join and never
    * appears in a returned plan). */
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
    val sub = nd.filter(col("nd") < minDocs).localCheckpoint()
    // the four sub-store writes are independent (nd/sub are
    // checkpointed; pairs and docs re-derive from the input) — fan
    // them out as concurrent jobs. Bucket-aligned repartition so each
    // store is nBuckets files, not shufflePartitions × nBuckets.
    Par.run(Seq(
      () => dict.write.mode("overwrite").parquet(s"$path/dict"),
      // sub-threshold pairs only
      () => pairs.join(sub.select(col("line")), Seq("line"), "left_semi")
        .withColumn("bucket", pairBucket(col("line"), nBuckets))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/pairs"),
      // the narrow detection store: additive count deltas per line
      () => sub.select(col("line"), col("nd").as("nd_delta"))
        .withColumn("bucket", pairBucket(col("line"), nBuckets))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/counts"),
      () => docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
        .withColumn("dbucket", docBucket(col("doc_id"), nDocBuckets))
        .repartition(col("dbucket"))
        .write.mode("overwrite").partitionBy("dbucket").parquet(s"$path/docs")))
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
    * `(pairsDelta, countsDelta, docsAppend, dictAppend, newMaxDoc,
    * changelog)`; every returned frame is either eagerly checkpointed
    * or derives only from checkpointed frames and the input batch, so
    * none re-reads the store after the caller starts mutating it. */
  private[graft] def computeFold(spark: SparkSession, path: String,
                                 batch: DataFrame, idCol: String,
                                 textCol: String, minDocs: Long,
                                 nBuckets: Int, nDocBuckets: Int):
      (DataFrame, DataFrame, DataFrame, DataFrame, Long, DataFrame) = {
    val prevMax = readMeta(spark, path, minDocs, nBuckets, nDocBuckets)
    // the batch feeds FOUR consumers (min/max guard, line pairs, the
    // doc-store append, the changelog clean) — checkpoint it once so
    // a batch defined as a filter over a large source is scanned
    // once, not four times (batch-sized memory, the fold's working
    // set either way)
    val b = batch.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .localCheckpoint()
    val mm = b.agg(min(col("doc_id")).cast("long"),
      max(col("doc_id")).cast("long")).head()
    require(!mm.isNullAt(0) && mm.getLong(0) > prevMax,
      s"monotonic-ingest contract: batch min doc id " +
        s"${if (mm.isNullAt(0)) "(empty)" else mm.getLong(0)} must exceed " +
        s"stored max $prevMax")
    // snapshot the dictionary BEFORE any mutation (eager — the
    // returned frames must not re-list the dict path after the
    // crossed-lines append below)
    val dict0 = spark.read.parquet(s"$path/dict").localCheckpoint()
    val bpairs = lines(b, "doc_id", "text")
      .select(col("line"), col("doc_id")).distinct()
      .localCheckpoint() // feeds candidate agg + delta write
    // candidate lines = batch lines not yet in the dictionary (a
    // dict line's count can never matter again — monotone)
    val candAgg = bpairs
      .join(broadcast(dict0), Seq("line"), "left_anti")
      .groupBy(col("line")).agg(count(lit(1)).as("ndb"))
      .localCheckpoint()
    // crossing detection against the NARROW counts store (candidate
    // lines hash over every bucket, so this scan is honestly
    // corpus-distinct-lines-sized — but it carries no doc ids and no
    // text, and readers sum the additive deltas per line). The batch
    // side is broadcast so the store scan is never shuffled — which
    // makes "batch distinct lines fit a broadcast" part of the fold
    // contract (batches are ingest-sized by definition; a
    // corpus-sized "batch" belongs in buildStore, not here).
    val nd0 = spark.read.parquet(s"$path/counts")
      .join(broadcast(candAgg.select(col("line"))), Seq("line"), "left_semi")
      .groupBy(col("line")).agg(sum(col("nd_delta")).as("nd0"))
    val crossed = candAgg
      .join(nd0.hint("broadcast"), Seq("line"), "left")
      .filter(coalesce(col("nd0"), lit(0L)) + col("ndb") >= minDocs)
      .select(col("line"))
      .localCheckpoint()
    // carrier lookup reads the WIDE pair store only for the crossed
    // lines' buckets — a handful, so the partition filter genuinely
    // prunes. The invalidated-id set is bounded (< minDocs ids per
    // crossed line) but stays DISTRIBUTED: only its ≤ nDocBuckets
    // dbucket values are collected for the doc store's partition
    // filter; the ids themselves reach the pruned read as a broadcast
    // semi-join (an `isin` over the ids would build a literal list
    // that grows with the crossing size).
    val crossedBuckets = crossed
      .select(pairBucket(col("line"), nBuckets).as("bucket"))
      .distinct().collect().map(_.getLong(0)).sorted
    val dictNew = dict0.unionByName(crossed).distinct().localCheckpoint()
    val invCarriers =
      if (crossedBuckets.isEmpty) None
      else {
        val ids = pairStoreRows(spark, path, crossedBuckets.toIndexedSeq)
          .join(broadcast(crossed), Seq("line"), "left_semi")
          .select(col("doc_id")).distinct()
          .localCheckpoint()
        if (ids.head(1).isEmpty) None else Some(ids)
      }
    val outInv = invCarriers.map { ids =>
      val dbuckets = ids
        .select(docBucket(col("doc_id"), nDocBuckets).as("dbucket"))
        .distinct().collect().map(r => java.lang.Long.valueOf(r.getLong(0)))
      val inv = spark.read.parquet(s"$path/docs")
        .filter(col("dbucket").isin(dbuckets.toIndexedSeq: _*))
        .join(broadcast(ids), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("text"))
        .localCheckpoint() // snapshot before the doc-store append below
      cleanWithDict(inv, "doc_id", "text", dictNew)
        .withColumnRenamed("doc_id", idCol)
    }
    val pairsDelta = bpairs.join(broadcast(dictNew), Seq("line"), "left_anti")
      .withColumn("bucket", pairBucket(col("line"), nBuckets))
    val countsDelta = candAgg.join(broadcast(dictNew), Seq("line"), "left_anti")
      .select(col("line"), col("ndb").as("nd_delta"))
      .withColumn("bucket", pairBucket(col("line"), nBuckets))
    val docsApp = b.withColumn("dbucket", docBucket(col("doc_id"), nDocBuckets))
    val outBatch = cleanWithDict(b, "doc_id", "text", dictNew)
      .withColumnRenamed("doc_id", idCol)
    val changelog = outInv.map(outBatch.unionByName(_)).getOrElse(outBatch)
    (pairsDelta, countsDelta, docsApp, crossed, mm.getLong(1), changelog)
  }

  /** Fold a monotonic document batch into a [[buildStore]] layout and
    * return the changelog emission: the batch cleaned under the
    * updated dictionary, PLUS re-emissions of every stored document a
    * threshold crossing invalidated. Latest emission per doc across
    * build + folds equals the full [[removeCommonLines]] recompute
    * bit-exactly — the c5 gate. The corpus text is never rescanned:
    * crossing detection reads the NARROW counts store (semi-joined to
    * the batch's candidate lines), the wide pair store is read
    * bucket-pruned for the crossed lines only (< minDocs rows per
    * line by the store invariant), and the doc store only for the
    * bounded invalidated-id set. Crash-redo contract as d26; the
    * streaming twin (s16) wraps [[computeFold]] in the
    * committed-staging exactly-once protocol instead. */
  /** Maintenance vacuum for a [[buildStore]] layout: crossed
    * (dictionary) lines' counts and pairs rows are dead — the
    * candidate path excludes dictionary lines, so no fold ever reads
    * them again — and each fold appends one counts delta per
    * still-sub-threshold candidate line, so a line folded daily for a
    * year carries 365 delta rows. Drops the dead rows and collapses
    * each line's deltas to one row, per partition, under
    * [[StoreCompaction.rewriteStore]]'s crash-convergent swap. Both
    * rewrites are read-invariant: detection sums deltas per line
    * (one row sums the same) and never consults dictionary lines.
    * Single-maintainer contract — do not run concurrently with
    * folds. */
  def vacuumStore(spark: SparkSession, path: String): Unit = {
    val dict = spark.read.parquet(s"$path/dict")
      .select(col("line")).distinct().localCheckpoint()
    StoreCompaction.rewriteStore(spark, s"$path/counts", df =>
      df.join(broadcast(dict), Seq("line"), "left_anti")
        .groupBy(col("line")).agg(sum(col("nd_delta")).as("nd_delta")))
    StoreCompaction.rewriteStore(spark, s"$path/pairs", df =>
      df.join(broadcast(dict), Seq("line"), "left_anti"))
  }

  def fold(spark: SparkSession, path: String, batch: DataFrame,
           idCol: String, textCol: String, minDocs: Long,
           nBuckets: Int = 64, nDocBuckets: Int = 64): DataFrame = {
    val (pairsDelta, countsDelta, docsApp, dictApp, newMax, changelog) =
      computeFold(spark, path, batch, idCol, textCol, minDocs,
        nBuckets, nDocBuckets)
    Par.run(Seq(
      () => pairsDelta.repartition(col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(s"$path/pairs"),
      () => countsDelta.repartition(col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(s"$path/counts"),
      () => docsApp.repartition(col("dbucket"))
        .write.mode("append").partitionBy("dbucket").parquet(s"$path/docs"),
      () => dictApp.write.mode("append").parquet(s"$path/dict")))
    writeMeta(spark, path, newMax, minDocs, nBuckets, nDocBuckets, "append")
    changelog
  }
}
