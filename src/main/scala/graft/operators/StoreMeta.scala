package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The pinned-parameter `_meta` discipline shared by every persisted
  * store family (substr d26, boilerplate c5, span store q98, quantile
  * cell store q96, heavy-hitter key store q92, SemDedup d23), factored
  * once so the contract — layout parameters are PINNED at build time
  * and every later operation must present (or read back) the same
  * values, loudly — has a single implementation instead of one
  * hand-rolled copy per family.
  *
  * Layout: `<store>_meta` is a parquet dir of one-row files. The build
  * writes the first row (mode overwrite); ingest folds APPEND one row
  * each (idempotent under the committed-staging protocol's
  * deterministic file names). Every row repeats the pinned fields —
  * so validation checks each row, catching a meta dir spliced from
  * two different layouts — and carries the fold's cursor values
  * (high-water marks maxed by readers, additive deltas summed).
  *
  * Why pinning is load-bearing (the r12 lesson, kept loud here): a
  * bucket count defines where a key LIVES, an `l`/`hashKeys` defines
  * what a key IS, a `cellBits` defines what a cell MEANS — an
  * operation run with a silently different value mis-prunes,
  * mis-joins, or mis-thresholds with NO error. Equality is therefore
  * `require`d per row with the stored and presented values named.
  */
object StoreMeta {

  def metaPath(store: String): String = s"${store}_meta"

  private def dataTypeOf(v: Any): DataType = v match {
    case _: Long    => LongType
    case _: Int     => IntegerType
    case _: Boolean => BooleanType
    case _: Double  => DoubleType
    case _: String  => StringType
    case other => throw new IllegalArgumentException(
      s"unsupported meta field type: ${other.getClass.getName}")
  }

  /** One meta row as a 1-row DataFrame with the fields' natural
    * parquet types — shared by direct writes and the streaming twins'
    * STAGED meta artifacts (which must produce the identical schema,
    * since promote just copies their files into the live meta dir). */
  def frame(spark: SparkSession, fields: Seq[(String, Any)]): DataFrame = {
    require(fields.nonEmpty, "meta row needs at least one field")
    spark.createDataFrame(
      java.util.Collections.singletonList(Row.fromSeq(fields.map(_._2))),
      StructType(fields.map { case (n, v) => StructField(n, dataTypeOf(v)) }))
  }

  /** Write one meta row to the store's `_meta` dir — `overwrite` for
    * the build's first row, `append` for a fold's cursor row. */
  def write(spark: SparkSession, store: String, mode: String,
            fields: Seq[(String, Any)]): Unit =
    frame(spark, fields).coalesce(1)
      .write.mode(mode).parquet(metaPath(store))

  /** Read every meta row and `require` that each `pinned` field
    * equals the presented value ON EVERY ROW — loud, naming the
    * store, the field, and both values. Returns the rows for cursor
    * extraction ([[maxLong]] / [[sumLong]] / [[pinnedOf]]). */
  def readRequire(spark: SparkSession, store: String,
                  pinned: Seq[(String, Any)]): Array[Row] = {
    val rows = spark.read.parquet(metaPath(store)).collect()
    require(rows.nonEmpty, s"no _meta at ${metaPath(store)}")
    rows.foreach { row =>
      pinned.foreach { case (name, expect) =>
        val got = row.getAs[Any](name)
        require(got == expect,
          s"store layout mismatch at $store: built with $name=$got, " +
            s"operation called with $name=$expect — a mismatched " +
            "layout parameter mis-prunes, mis-joins, or " +
            "mis-thresholds with no error")
      }
    }
    rows
  }

  /** Ingest high-water mark: max of an append-only cursor column. */
  def maxLong(rows: Array[Row], name: String): Long =
    rows.map(_.getAs[Long](name)).max

  /** Additive cursor: sum of per-fold deltas. */
  def sumLong(rows: Array[Row], name: String): Long =
    rows.map(_.getAs[Long](name)).sum

  /** Read back a pinned field the caller does NOT pass (the
    * free-parameter-removed pattern — q96's `cell_bits`, c5's `eps`):
    * every row must agree on it. */
  def pinnedOf[T](rows: Array[Row], store: String, name: String): T = {
    val vs = rows.toSeq.map(_.getAs[Any](name)).distinct
    require(vs.length == 1,
      s"store meta at $store is inconsistent: $name has values " +
        s"${vs.mkString(", ")}")
    vs.head.asInstanceOf[T]
  }
}
