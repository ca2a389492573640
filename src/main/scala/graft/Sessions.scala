package graft

import org.apache.spark.sql.SparkSession

/** Shared session configuration so Verify, Bench, and tests run with
  * identical semantics.
  *
  * - UTC session TZ: the reference is UTC end-to-end
  *   (`/root/reference/src/transform/hn_transform.py:35,88`); a non-UTC
  *   TZ silently shifts `to_date`.
  * - `nanosAsLong`: the driver's `events.parquet` carries
  *   TIMESTAMP(NANOS), unsupported by Spark 4 readers; we read it as
  *   long and normalize in [[Tables.events]].
  * - AQE on: runtime coalescing of shuffle partitions + skew-join
  *   handling — the local stand-in for what we'd rely on at cluster
  *   scale.
  */
object Sessions {
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")

  def local(cores: Int = 32): SparkSession = {
    val s = tune(SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
