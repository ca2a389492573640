package graft

import org.apache.spark.sql.functions._
import graft.operators.Boilerplate

/** The incremental boilerplate store's changelog contract: a line
  * crossing the minDocs threshold in a later batch must RE-EMIT the
  * stored docs that carry it (earlier cleaned output is retroactively
  * wrong — the property no other ingest family in this repo has), and
  * latest-emission-per-doc equals the full recompute bit-exactly.
  * Also pins the bucket-pruned pair-store read and the loud layout /
  * monotonicity guards. */
class BoilerplateStoreSpec extends SparkSpec {
  import spark.implicits._

  private val m = 3L
  private val nB = 16

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // promo line reaches nd=2 in the build, crosses (nd=3) in fold 1,
  // and is already dictionary boilerplate by fold 2
  private val build = docsDf(
    (1L, "promo line\nalpha one"),
    (2L, "promo line\nbeta two"),
    (3L, "gamma three\ndelta four"),
    (4L, "epsilon five"))
  private val batch1 = docsDf(
    (5L, "promo line\nzeta six"),
    (6L, "eta seven"))
  private val batch2 = docsDf(
    (7L, "promo line\ntheta eight"),
    (8L, "iota nine"))

  test("threshold crossing re-emits invalidated stored docs; latest-wins equals full recompute") {
    val tmp = java.nio.file.Files.createTempDirectory("boiler_store")
    val store = s"$tmp/state"
    val e0 = Boilerplate.buildStore(build, "doc_id", "text", m, store, nB, 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // build: promo nd=2 < 3 — docs 1,2 ship with promo still present
    assert(e0(1L)._1 == "promo line\nalpha one" && e0(1L)._2 == 0L)

    val e1 = Boilerplate.fold(spark, store, batch1, "doc_id", "text", m, nB, 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // fold 1: promo crosses (2 stored + 1 batch = 3) → batch doc 5 is
    // cleaned AND stored docs 1,2 are re-emitted cleaned
    assert(e1.keySet === Set(1L, 2L, 5L, 6L))
    assert(e1(5L) === (("zeta six", 1L)))
    assert(e1(1L) === (("alpha one", 1L)), "invalidated build doc re-emitted")
    assert(e1(2L) === (("beta two", 1L)))

    val e2 = Boilerplate.fold(spark, store, batch2, "doc_id", "text", m, nB, 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // fold 2: promo already in the dictionary — no re-emission
    assert(e2.keySet === Set(7L, 8L))
    assert(e2(7L) === (("theta eight", 1L)))

    // latest-wins over the changelog == full recompute
    val latest = (e0 ++ e1 ++ e2) // later maps win on key collision
    val full = Boilerplate.removeCommonLines(
        build.unionByName(batch1).unionByName(batch2), "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(latest === full)
  }

  test("pair-store read is bucket-pruned; guards are loud") {
    val tmp = java.nio.file.Files.createTempDirectory("boiler_store2")
    val store = s"$tmp/state"
    Boilerplate.buildStore(build, "doc_id", "text", m, store, nB, 8).count()

    val cand = Seq("promo line", "zeta six")
    val buckets = cand.map(Boilerplate.bucketOf(_, nB)).distinct.sorted
    val pruned = Boilerplate.pairStoreRows(spark, store, buckets)
    val planStr = pruned.queryExecution.executedPlan.toString
    // a single candidate bucket folds `isin` to `=`, so match both forms
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(planStr).isDefined,
      s"pair read must carry a static bucket partition filter:\n" +
        planStr.take(2000))
    val scanned = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.toSeq.map(_.filePath.toString)
    }.flatten
    assert(scanned.nonEmpty)
    assert(scanned.forall(p => buckets.exists(b => p.contains(s"bucket=$b/"))),
      s"scan must touch only candidate buckets $buckets, saw:\n" +
        scanned.mkString("\n"))
    val allBuckets = spark.read.parquet(s"$store/pairs")
      .select("bucket").distinct().count()
    assert(allBuckets > buckets.size,
      "fixture must leave unread buckets for the proof to bite")

    // a dictionary line's pairs and count deltas are NOT appended
    // (sub-threshold invariant: crossed lines never rejoin the
    // candidate path)
    Boilerplate.fold(spark, store, batch1, "doc_id", "text", m, nB, 8).count()
    val promoBucket = Boilerplate.bucketOf("promo line", nB)
    val promoRows = Boilerplate.pairStoreRows(spark, store, Seq(promoBucket))
      .filter(col("line") === "promo line").count()
    assert(promoRows == 2L,
      "only the pre-crossing pairs remain; the crossing batch appends none")
    val promoCounts = spark.read.parquet(s"$store/counts")
      .filter(col("line") === "promo line")
      .agg(count(lit(1)), sum(col("nd_delta"))).head()
    assert(promoCounts.getLong(0) == 1L && promoCounts.getLong(1) == 2L,
      "counts hold only the build's pre-crossing delta for a crossed line")

    // monotonicity and layout mismatches fail loudly
    val eMono = intercept[IllegalArgumentException] {
      Boilerplate.fold(spark, store, build, "doc_id", "text", m, nB, 8)
    }
    assert(eMono.getMessage.contains("monotonic"))
    val eLayout = intercept[IllegalArgumentException] {
      Boilerplate.fold(spark, store, batch2, "doc_id", "text", m + 1, nB, 8)
    }
    assert(eLayout.getMessage.contains("layout mismatch"))
  }

  test("vacuum drops dead rows, collapses deltas; post-vacuum folds stay exact") {
    // promo crosses in batch A (dead rows for the vacuum to drop);
    // footer crosses in batch B AFTER the vacuum — collapsed counts
    // must still detect it and the surviving pairs must still name
    // its stored carriers (docs 3, 4) for re-emission
    val vb = docsDf(
      (1L, "promo line\na one"), (2L, "promo line\nb two"),
      (3L, "footer line\nc three"), (4L, "footer line\nd four"))
    val bA = docsDf((5L, "promo line\ne five"), (6L, "f six"))
    val bB = docsDf((7L, "footer line\ng seven"), (8L, "h eight"))
    def runTo(store: String, vacuum: Boolean) = {
      Boilerplate.buildStore(vb, "doc_id", "text", m, store, nB, 8).count()
      Boilerplate.fold(spark, store, bA, "doc_id", "text", m, nB, 8).count()
      if (vacuum) Boilerplate.vacuumStore(spark, store)
      Boilerplate.fold(spark, store, bB, "doc_id", "text", m, nB, 8)
    }
    val tmp = java.nio.file.Files.createTempDirectory("boiler_vac")
    val (sv, sp) = (s"$tmp/vac", s"$tmp/plain")
    val eVac = runTo(sv, vacuum = true)
    val ePlain = runTo(sp, vacuum = false)
    assert(eVac.exceptAll(ePlain).isEmpty && ePlain.exceptAll(eVac).isEmpty,
      "a fold over a vacuumed store must be bit-identical")
    assert(eVac.filter(col("doc_id").isin(3L, 4L)).count() == 2L,
      "the post-vacuum crossing must re-emit its stored carriers")
    // dead rows gone, live deltas collapsed to one row per line
    val counts = spark.read.parquet(s"$sv/counts")
    assert(counts.filter(col("line") === "promo line").count() == 0L &&
      spark.read.parquet(s"$sv/pairs")
        .filter(col("line") === "promo line").count() == 0L,
      "the crossed line's counts and pairs rows are dead and dropped")
    val maxRows = counts.groupBy(col("line")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxRows == 1L, "vacuum must collapse deltas to one row per line")
  }
}
