package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Dynamic partition overwrite: the incremental-refresh write pattern —
  * rewrite ONLY the date partitions present in the batch, leave the
  * rest of the mart untouched. Static overwrite mode would drop the
  * whole table; at 100 TB that is the difference between rewriting one
  * day and rewriting three years. */
class PartitionOverwriteSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic mode rewrites only the partitions in the batch") {
    val root = Files.createTempDirectory("dpo").toString + "/mart"
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq(("2024-01-01", 1L, 10.0), ("2024-01-02", 2L, 20.0))
        .toDF("d", "k", "v")
        .write.partitionBy("d").mode("overwrite").parquet(root)
      // second batch: only day 2 changes (value corrected)
      Seq(("2024-01-02", 2L, 99.0)).toDF("d", "k", "v")
        .write.partitionBy("d").mode("overwrite").parquet(root)
      val got = spark.read.parquet(root)
        .select($"d", $"k", $"v").as[(String, Long, Double)].collect().toSet
      // day 1 survives, day 2 replaced
      assert(got == Set(("2024-01-01", 1L, 10.0), ("2024-01-02", 2L, 99.0)))
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("partition pruning reads only the requested date directory") {
    val root = Files.createTempDirectory("dpo2").toString + "/mart"
    (1 to 5).flatMap(d => Seq((f"2024-01-0$d", d.toLong, d * 1.0)))
      .toDF("d", "k", "v")
      .write.partitionBy("d").mode("overwrite").parquet(root)
    val q = spark.read.parquet(root).filter($"d" === "2024-01-03")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(d"),
      s"no partition filter in:\n$scan")
    assert(q.count() == 1)
  }
}
