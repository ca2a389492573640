package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * All queries take a scale-factor directory and read single parquet
  * files. At cluster scale these would be partitioned table roots; the
  * API is identical (`spark.read.parquet(root)`), and every downstream
  * operator is written so filters/projections push into the scan.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 cannot read
    * natively; sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (see [[Sessions.tune]]) so it arrives as long nanos. Normalize to a
    * microsecond timestamp here with integer `div` (a double division
    * would lose precision above 2^53 ns ≈ 1970+104 days). DuckDB's
    * `CAST(ts AS TIMESTAMP)` truncates ns→us identically. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeNanos(load(spark, dir, "events"))

  /** Shared ns→us normalization for any frame carrying a raw long-nanos
    * `ts` (batch loads AND streaming sources must agree bit-for-bit). */
  def normalizeNanos(df: DataFrame): DataFrame =
    df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
