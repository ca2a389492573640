package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.StreamingJobs

class StreamingMergeSpec extends SparkSpec {
  import spark.implicits._

  test("streaming merge: arriving files upsert into versioned staging") {
    val root = Files.createTempDirectory("smerge").toString
    val src = s"$root/src"; Files.createDirectories(Paths.get(src))
    val staging = s"$root/staging"; val ckpt = s"$root/ckpt"
    // write batch 1 directly into the source dir
    Seq((1L, 10L, "a"), (2L, 5L, "b")).toDF("id", "version", "payload")
      .coalesce(1).write.mode("overwrite").parquet(s"$src/b1")
    val schema = spark.read.parquet(s"$src/b1").schema
    val q = StreamingJobs.streamingMerge(spark, s"$src/*", schema,
      staging, Seq("id"), "version", ckpt)
    try {
      q.processAllAvailable()
      val v1 = spark.read.parquet(s"$staging/v000001")
      assert(v1.count() == 2)
      // batch 2 arrives: stale row for id 1, newer for id 2, new id 3
      Seq((1L, 9L, "stale"), (2L, 6L, "newer"), (3L, 1L, "new"))
        .toDF("id", "version", "payload")
        .coalesce(1).write.mode("overwrite").parquet(s"$src/b2")
      q.processAllAvailable()
      val latest = graft.pipeline.HnPipeline
        .latestFile(spark, s"$staging/v*").get
      val st = spark.read.parquet(latest)
        .select("id", "version", "payload").as[(Long, Long, String)]
        .collect().toSet
      assert(st == Set((1L, 10L, "a"), (2L, 6L, "newer"), (3L, 1L, "new")))
    } finally q.stop()
  }
}
