package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}

/** File sinks beyond the stock writers — SURVEY §2.A. */
object Sinks {

  /** A4 — one-JSON-array-per-file sink, the reference's raw format
    * (`json.dump(records)` → a single `[...]` array,
    * `/root/reference/src/extract/hn_extract.py:62-71`). The reference
    * writes 50-item batches; this stays faithful (single file, valid
    * JSON array) while draining through the distributed writer: rows
    * serialize to JSON strings on executors, and only the final
    * file assembly is single-stream. At cluster scale raw batches would
    * be JSONL parts instead — this sink exists for format parity. */
  def writeJsonArray(df: DataFrame, destFile: String): Unit = {
    val spark = df.sparkSession
    val tmp = destFile + ".tmp"
    df.toJSON.coalesce(1).write.mode(SaveMode.Overwrite).text(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(destFile).getFileSystem(conf)
    val part = fs.globStatus(new Path(s"$tmp/part-*")).head.getPath
    val out = fs.create(new Path(destFile), true)
    val in = fs.open(part)
    try {
      out.write('[')
      val reader = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
      var line = reader.readLine()
      var first = true
      while (line != null) {
        if (!first) out.write(",\n".getBytes("UTF-8")) else first = false
        out.write(line.getBytes("UTF-8"))
        line = reader.readLine()
      }
      out.write(']')
    } finally {
      in.close(); out.close(); fs.delete(new Path(tmp), true)
    }
  }

  /** A7 analog with the reference's timestamped-name convention
    * (`hn_staging_<ts>.parquet`, `hn_transform.py:121-133`). */
  def writeTimestampedParquet(df: DataFrame, dir: String, prefix: String,
                              ts: String): String = {
    val dest = s"$dir/${prefix}_$ts.parquet"
    df.write.mode(SaveMode.Overwrite).parquet(dest)
    dest
  }

  /** Fixed schema of the audit log (column order = CSV column order). */
  val AuditSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("run_id",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("phase",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("status",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("row_count",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("at_us",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("error",
        org.apache.spark.sql.types.StringType, nullable = true)))

  /** K3 — audit run-tracking as an append-only CSV table
    * (`/root/reference/sql/load/01_audit.sql:1-17`,
    * `src/load/hn_load.py:109-165`): one row per phase transition
    * (`running` → `success`/`failed`), error messages clipped to 4000
    * chars (C14, `hn_load.py:151`). Spark-idiomatic: an append-mode CSV
    * directory — each append is one new part file, so concurrent runs
    * never rewrite each other and the sink stays atomic per append
    * (no read-modify-write). Read back with [[readAudit]]. */
  def appendAudit(spark: org.apache.spark.sql.SparkSession, dir: String,
                  runId: String, phase: String, status: String,
                  rowCount: Long, atUs: Long,
                  error: Option[String] = None): Unit = {
    import org.apache.spark.sql.Row
    val clipped = error.map(_.take(4000)).orNull
    val df = spark.createDataFrame(
      java.util.List.of(Row(runId, phase, status, rowCount, atUs, clipped)),
      AuditSchema)
    df.coalesce(1).write.mode(SaveMode.Append).csv(dir)
  }

  /** Audit log scan with the fixed schema (CSV carries no header). */
  def readAudit(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.schema(AuditSchema).csv(dir)
}
