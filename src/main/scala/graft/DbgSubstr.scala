package graft
import org.apache.spark.sql.functions._
import graft.operators.DedupSuite
object DbgSubstr {
  def main(a: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .appName("dbg").getOrCreate()
    import spark.implicits._
    val run = "one two three four five six seven eight nine ten"
    val docs = (0L until 40L).map { i =>
      if (i % 4 == 0) (i, s"$run filler${i} more${i} yet${i}")
      else (i, s"unique${i} body${i} text${i} of${i} doc${i} number${i} fill${i} pad${i} tail${i}")
    }.toDF("doc_id", "text")
    val store = java.nio.file.Files.createTempDirectory("dbg_substr").toString + "/state"
    DedupSuite.exactSubstrBuildStore(docs, "doc_id", "text", 8, store, nBuckets = 16)
    val out = DedupSuite.exactSubstrFold(spark, store,
      Seq((99L, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("doc_id", "text"),
      "doc_id", "text", 8, nBuckets = 16)
    out.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
      println("  " * d + p.getClass.getSimpleName + (p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          " roots=" + f.relation.location.rootPaths.mkString(",")
        case _ => ""
      }))
      p match {
        case x: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(x.executedPlan, d + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan, d + 1)
        case o => o.children.foreach(walk(_, d + 1))
      }
    }
    walk(out.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
