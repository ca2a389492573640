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
}
