package graft

import org.apache.spark.sql.functions._

/** Scale soak for t15 BPE training (dev tool): the incremental
  * pair-count trainer vs the recount trainer at a REAL merge count
  * (k = 512, override via SPARK_GRAFT_BPE_K) over a ~100k-word
  * hex-alphabet vocabulary (16 base symbols — the byte-level-BPE
  * shape, where the pair table starts at ≤ 256 rows and grows only
  * with learned symbols).
  *
  * Claims verified at volume:
  *  - EXACTNESS: both trainers emit the identical merge table
  *    (rank, lhs, rhs, cnt) for all k merges;
  *  - ECONOMICS: the recount form pays k vocabulary-sized explode +
  *    shuffle rounds; the incremental form pays k pair-table-sized
  *    delta aggregations plus amortized state rewrites — the soak
  *    prints both wall-clocks and their ratio.
  *
  * Deterministic fixture (md5 of id arithmetic, no RNG).
  * `sbt "runMain graft.BpeSoak"` — one JSON line.
  */
object BpeSoak {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val k = sys.env.get("SPARK_GRAFT_BPE_K").map(_.toInt).getOrElse(512)
    val vocab = 100000L
    val rows = 1000000L
    val path = "target/soak/bpe/docs.parquet"
    // each row one word; word = md5-hex prefix of its vocab index,
    // lengths 8..12 — [0-9a-f] tokens, so 16 base symbols
    spark.range(rows).select(
        substring(md5((col("id") % vocab).cast("string")),
          1, 8).as("p"),
        ((col("id") % vocab) % 5).cast("int").as("extra"),
        md5((col("id") % vocab).cast("string")).as("h"))
      .select(concat(col("p"),
        substring(col("h"), 9, 4).substr(lit(1), col("extra"))).as("text"))
      .repartition(32).write.mode("overwrite").parquet(path)
    val docs = spark.read.parquet(path)

    val (inc, tInc) = time {
      graft.functions.Bpe.bpeTrainIncremental(docs, "text", k)
        .collect().map(r =>
          (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
    }
    val (rec, tRec) = time {
      graft.functions.Bpe.bpeTrain(docs, "text", k)
        .collect().map(r =>
          (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
    }
    val equal = inc == rec
    require(equal, s"incremental and recount merge tables diverge " +
      s"(first diff at rank ${inc.zip(rec).indexWhere(p => p._1 != p._2) + 1})")
    require(inc.size == k, s"expected $k merges, got ${inc.size}")
    println(
      s"""{"metric":"bpe_soak","k":$k,"vocab":$vocab,"rows":$rows,""" +
        s""""sec_incremental":${"%.1f".format(tInc)},""" +
        s""""sec_recount":${"%.1f".format(tRec)},""" +
        s""""speedup":${"%.2f".format(tRec / tInc)},"equal":$equal}""")
    spark.stop()
  }
}
