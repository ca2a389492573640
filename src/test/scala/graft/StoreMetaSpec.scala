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
      StoreMeta.frame(spark, Seq("bad" -> Seq(1, 2)))
    }
  }

  test("frame writes the field's natural parquet type (staged == live)") {
    val store = tmpStore()
    StoreMeta.frame(spark, Seq("max_doc" -> 5L, "l" -> 40,
        "hash_keys" -> false))
      .coalesce(1).write.parquet(StoreMeta.metaPath(store))
    val schema = spark.read.parquet(StoreMeta.metaPath(store)).schema
    import org.apache.spark.sql.types._
    assert(schema("max_doc").dataType === LongType)
    assert(schema("l").dataType === IntegerType)
    assert(schema("hash_keys").dataType === BooleanType)
  }
}
