package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomFilter

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val p = BloomFilter.sized(expectedKeys = 1000, fpp = 0.01)

  test("sized follows the standard formula and respects caps") {
    // n=1000, p=0.01 -> m ~ 9586 bits -> 150 words, k ~ 7
    assert(p.nWords == 150 && p.k == 7)
    assert(BloomFilter.sized(1L, 0.5).k >= 1)
    assert(BloomFilter.sized(Long.MaxValue / 4, 0.001).nWords <= (1 << 22))
  }

  test("no false negatives: every inserted key probes true") {
    val keys = (0 until 1000).map(i => s"key-$i")
    val df = keys.toDF("k")
    val bits = BloomFilter.build(df, col("k"), p)
    val misses = df
      .filter(!BloomFilter.mightContain(col("k"), bits, p.k)).count()
    assert(misses == 0L)
  }

  test("false-positive rate on disjoint keys is near the configured fpp") {
    val bits = BloomFilter.build(
      (0 until 1000).map(i => s"key-$i").toDF("k"), col("k"), p)
    val n = 20000L
    val fps = spark.range(n)
      .select(concat(lit("other-"), col("id")).as("k"))
      .filter(BloomFilter.mightContain(col("k"), bits, p.k)).count()
    // configured 1%; allow generous slack for hash variance
    assert(fps.toDouble / n < 0.05, s"fp rate ${fps.toDouble / n}")
  }

  test("build is partition-independent (merge is associative+commutative)") {
    val df = (0 until 500).map(i => s"k$i").toDF("k")
    val one = BloomFilter.build(df.coalesce(1), col("k"), p)
    val many = BloomFilter.build(df.repartition(7), col("k"), p)
    assert(java.util.Arrays.equals(one, many))
  }

  test("prunedLeftAnti is bit-identical to the plain left anti join") {
    val batch = (0 until 300).map(i => (i.toLong, s"text-${i % 120}"))
      .toDF("id", "text")
    val seen = (0 until 200).map(i => s"text-${i * 2}").toDF("t")
      .select(md5(col("t")).as("h")).distinct()
    val plain = batch.join(seen, md5(col("text")) === col("h"), "left_anti")
    val pruned = BloomFilter.prunedLeftAnti(batch, seen,
      md5(col("text")), col("h"), p)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("pruning drops non-candidate rows and accounts for it via observe") {
    // batch keys cover 1% of the seen universe: nearly all seen rows
    // must be pruned before the join
    val batch = (0 until 100).map(i => s"k${i * 100}").toDF("k")
    val seen = spark.range(10000)
      .select(concat(lit("k"), col("id")).as("sk"))
    val out = BloomFilter.prunedLeftAnti(batch, seen, col("k"), col("sk"), p)
    // collect() drives out's OWN QueryExecution so the observed metrics
    // materialize on it (same pattern as ObserveMetricsSpec)
    assert(out.collect().isEmpty) // every batch key exists in seen
    val m = out.queryExecution.observedMetrics("bloom_prune")
    assert(m.getAs[Long]("seen_rows") == 10000L)
    // 100 true hits + fp slack; the point is it is NOT ~10000
    val kept = m.getAs[Long]("kept_rows")
    assert(kept >= 100L && kept < 1000L, s"kept=$kept")
  }

  test("broadcast probe agrees with the literal probe bit-for-bit") {
    val keys = (0 until 1000).map(i => s"key-$i")
    val bits = BloomFilter.build(keys.toDF("k"), col("k"), p)
    val bc = spark.sparkContext.broadcast(bits)
    // mixed members and non-members; the two probe forms must agree on
    // every row (including false positives - same probe positions)
    val mixed = spark.range(3000)
      .select(when(col("id") % 3 === 0, concat(lit("key-"), col("id") / 3))
        .otherwise(concat(lit("nope-"), col("id"))).as("k"))
    val disagree = mixed.filter(
      BloomFilter.mightContain(col("k"), bits, p.k) =!=
        BloomFilter.mightContain(col("k"), bc, p.k)).count()
    assert(disagree == 0L)
    // and no false negatives through the broadcast path either
    val misses = keys.toDF("k")
      .filter(!BloomFilter.mightContain(col("k"), bc, p.k)).count()
    assert(misses == 0L)
  }

  test("two probe Columns built before analysis keep their own bitmaps") {
    // regression (ADVICE r6): the registry-based probe resolved BOTH
    // Columns to the LAST-registered broadcast when neither had been
    // analyzed yet — silently wrong membership. Direct construction
    // pins (bc, k) at Column-build time.
    val aKeys = (0 until 200).map(i => s"a-$i").toDF("k")
    val bKeys = (0 until 200).map(i => s"b-$i").toDF("k")
    val bcA = spark.sparkContext.broadcast(BloomFilter.build(aKeys, col("k"), p))
    val probeA = BloomFilter.mightContain(col("k"), bcA, p.k)
    val bcB = spark.sparkContext.broadcast(BloomFilter.build(bKeys, col("k"), p))
    val probeB = BloomFilter.mightContain(col("k"), bcB, p.k) // built before probeA is used
    assert(aKeys.filter(!probeA).count() == 0L, "probeA lost its bitmap")
    assert(bKeys.filter(!probeB).count() == 0L, "probeB lost its bitmap")
    // disjoint key families: cross-membership is fp-rare, not total
    assert(bKeys.filter(probeA).count() < 50L, "probeA answered with B's bitmap")
    assert(aKeys.filter(probeB).count() < 50L, "probeB answered with A's bitmap")
  }
}
