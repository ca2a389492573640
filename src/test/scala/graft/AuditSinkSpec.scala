package graft

import java.nio.file.Files
import graft.sources.Sinks

/** K3 audit run-tracking sink: append-only CSV, error clipping, typed
  * read-back (SURVEY §2.K). */
class AuditSinkSpec extends SparkSpec {
  import spark.implicits._

  test("audit appends accumulate and read back typed, errors clipped to 4000") {
    val dir = Files.createTempDirectory("audit_csv").toString + "/log"
    Sinks.appendAudit(spark, dir, "run-1", "load", "running", 0L, 1000L)
    Sinks.appendAudit(spark, dir, "run-1", "load", "success", 42L, 2000L)
    Sinks.appendAudit(spark, dir, "run-2", "load", "failed", 0L, 3000L,
      error = Some("x" * 5000))
    val rows = Sinks.readAudit(spark, dir)
      .orderBy($"at_us").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(2)).toSeq == Seq("running", "success", "failed"))
    assert(rows(1).getLong(3) == 42L)
    assert(rows(2).getString(5).length == 4000) // C14 clip
    // latest status per run via keep-last (the audit read pattern)
    val latest = graft.operators.Dedup.keepLast(
        Sinks.readAudit(spark, dir), Seq("run_id"),
        org.apache.spark.sql.functions.col("at_us"))
      .select($"run_id", $"status").as[(String, String)].collect().toMap
    assert(latest == Map("run-1" -> "success", "run-2" -> "failed"))
  }
}
