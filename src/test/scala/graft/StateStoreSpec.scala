package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** State-store provider parity: the default HDFS-backed store keeps
  * state on the executor heap — fine for thousands of keys, fatal for
  * the billions a 100 TB stream accumulates. RocksDB (in-box since
  * Spark 3.2) spills to local disk. Same query, both providers, same
  * results — switching is pure configuration. */
class StateStoreSpec extends SparkSpec {
  import spark.implicits._

  private def runSessionAgg(provider: String): Set[(Long, Long, Long)] = {
    val dir = Files.createTempDirectory(s"ss_$provider").toString
    val ev = Tables.events(spark, sf).select($"ts", $"user_id")
    ev.write.mode("overwrite").parquet(dir)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    try {
      val name = s"ss_out_${provider.split('.').last}"
      val q = spark.readStream.schema(ev.schema).parquet(dir)
        .withWatermark("ts", "1 hour")
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name)
        .select($"user_id", unix_micros($"session_window.start"), $"n")
        .as[(Long, Long, Long)].collect().toSet
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("RocksDB state store produces identical sessions to the default store") {
    val hdfs = runSessionAgg(
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    val rocks = runSessionAgg(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    assert(rocks == hdfs, s"providers diverged: ${rocks.size} vs ${hdfs.size} sessions")
    assert(hdfs.nonEmpty)
  }
}
