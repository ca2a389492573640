package graft

import graft.operators.StoreMeta

/** The shared pinned-parameter `_meta` contract every persisted store
  * family rides on: parameters written at build time must be
  * presented (or read back) identically by every later operation,
  * loudly, on EVERY meta row — including rows appended by later
  * ingests. */
class StoreMetaSpec extends SparkSpec {

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("meta_spec").toString + "/store"

  test("roundtrip pins every supported field type") {
    val store = tmpStore()
    StoreMeta.write(spark, store, "overwrite", Seq(
      "n_buckets" -> 32, "min_docs" -> 7L, "hash_keys" -> true,
      "tau" -> 0.85, "name" -> "layout-v1"))
    val rows = StoreMeta.readRequire(spark, store, Seq(
      "n_buckets" -> 32, "min_docs" -> 7L, "hash_keys" -> true,
      "tau" -> 0.85, "name" -> "layout-v1"))
    assert(rows.length === 1)
    assert(StoreMeta.pinnedOf[Int](rows, store, "n_buckets") === 32)
    assert(StoreMeta.pinnedOf[Boolean](rows, store, "hash_keys"))
  }

  test("a mismatched pinned field fails loudly, naming both values") {
    val store = tmpStore()
    StoreMeta.write(spark, store, "overwrite",
      Seq("n_buckets" -> 32, "max_doc" -> 10L))
    val e = intercept[IllegalArgumentException] {
      StoreMeta.readRequire(spark, store, Seq("n_buckets" -> 64))
    }
    assert(e.getMessage.contains("store layout mismatch"))
    assert(e.getMessage.contains("n_buckets=32") &&
      e.getMessage.contains("n_buckets=64"))
  }

  test("validation covers EVERY row: a spliced meta dir is rejected") {
    val store = tmpStore()
    StoreMeta.write(spark, store, "overwrite",
      Seq("n_buckets" -> 32, "max_doc" -> 10L))
    StoreMeta.write(spark, store, "append",
      Seq("n_buckets" -> 16, "max_doc" -> 20L)) // a foreign layout row
    val e = intercept[IllegalArgumentException] {
      StoreMeta.readRequire(spark, store, Seq("n_buckets" -> 32))
    }
    assert(e.getMessage.contains("store layout mismatch"))
  }

  test("append-only cursors: max high-water and additive sum") {
    val store = tmpStore()
    StoreMeta.write(spark, store, "overwrite",
      Seq("seq_len" -> 128L, "max_doc" -> 10L, "token_delta" -> 100L))
    StoreMeta.write(spark, store, "append",
      Seq("seq_len" -> 128L, "max_doc" -> 25L, "token_delta" -> 40L))
    StoreMeta.write(spark, store, "append",
      Seq("seq_len" -> 128L, "max_doc" -> 18L, "token_delta" -> 2L))
    val rows = StoreMeta.readRequire(spark, store, Seq("seq_len" -> 128L))
    assert(StoreMeta.maxLong(rows, "max_doc") === 25L)
    assert(StoreMeta.sumLong(rows, "token_delta") === 142L)
  }

  test("pinnedOf (free-parameter-removed read-back) requires agreement") {
    val store = tmpStore()
    StoreMeta.write(spark, store, "overwrite", Seq("eps" -> 4L))
    StoreMeta.write(spark, store, "append", Seq("eps" -> 4L))
    assert(StoreMeta.pinnedOf[Long](
      StoreMeta.readRequire(spark, store, Nil), store, "eps") === 4L)
    StoreMeta.write(spark, store, "append", Seq("eps" -> 5L))
    val e = intercept[IllegalArgumentException] {
      StoreMeta.pinnedOf[Long](
        StoreMeta.readRequire(spark, store, Nil), store, "eps")
    }
    assert(e.getMessage.contains("inconsistent"))
  }

  test("missing meta dir is loud; unsupported field types are refused") {
    intercept[Exception] {
      StoreMeta.readRequire(spark, tmpStore(), Nil)
    }
    intercept[IllegalArgumentException] {
      StoreMeta.write(spark, tmpStore(), "overwrite", Seq("bad" -> Seq(1, 2)))
    }
  }

  test("driver-written meta reads back in Spark with natural types") {
    // the staged == live schema contract: promote copies driver-written
    // files verbatim, and anything else (Spark included) must read them
    // with the exact types Spark itself would have written
    val store = tmpStore()
    StoreMeta.write(spark, store, "overwrite",
      Seq("max_doc" -> 5L, "l" -> 40, "hash_keys" -> false,
        "tau" -> 0.25, "name" -> "layout-v1"))
    val df = spark.read.parquet(StoreMeta.metaPath(store))
    import org.apache.spark.sql.types._
    assert(df.schema("max_doc").dataType === LongType)
    assert(df.schema("l").dataType === IntegerType)
    assert(df.schema("hash_keys").dataType === BooleanType)
    assert(df.schema("tau").dataType === DoubleType)
    assert(df.schema("name").dataType === StringType)
    val r = df.head()
    assert(r.getAs[Long]("max_doc") === 5L && r.getAs[Int]("l") === 40 &&
      !r.getAs[Boolean]("hash_keys") && r.getAs[Double]("tau") === 0.25 &&
      r.getAs[String]("name") === "layout-v1")
  }

  test("Spark-written meta rows (pre-change stores) read back driver-side") {
    import spark.implicits._
    val store = tmpStore()
    Seq((5L, 40, false)).toDF("max_doc", "l", "hash_keys")
      .coalesce(1).write.parquet(StoreMeta.metaPath(store))
    val rows = StoreMeta.readRequire(spark, store,
      Seq("l" -> 40, "hash_keys" -> false))
    assert(rows.length === 1)
    assert(StoreMeta.maxLong(rows, "max_doc") === 5L)
  }

  test("a row missing a later-added field names the migration, not a raw lookup error") {
    val store = tmpStore()
    StoreMeta.write(spark, store, "overwrite", Seq("min_docs" -> 3L))
    val rows = StoreMeta.readRequire(spark, store, Seq("min_docs" -> 3L))
    val e = intercept[IllegalArgumentException] {
      StoreMeta.pinnedOf[Long](rows, store, "eps")
    }
    assert(e.getMessage.contains("predates"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      StoreMeta.readRequire(spark, store, Seq("eps" -> 4L))
    }
    assert(e2.getMessage.contains("predates"), e2.getMessage)
  }

  test("footerMaxLong matches an agg over flat-store files, without a job") {
    import spark.implicits._
    val dir = tmpStore()
    Seq((1L, "a"), (7L, "b")).toDF("fseq", "line")
      .coalesce(1).write.parquet(dir)
    Seq((12L, "c"), (3L, "d")).toDF("fseq", "line")
      .coalesce(1).write.mode("append").parquet(dir)
    assert(StoreMeta.footerMaxLong(spark, dir, "fseq") === Some(12L))
    intercept[IllegalArgumentException] {
      StoreMeta.footerMaxLong(spark, dir, "nope")
    }
    assert(StoreMeta.footerMaxLong(spark, tmpStore(), "fseq") === None)
  }
}
