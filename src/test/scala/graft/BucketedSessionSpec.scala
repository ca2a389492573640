package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows

/** Two-pass bucketed sessionization must equal the single-window form
  * exactly — summaries, boundaries, counts — while parallelizing over
  * time buckets. */
class BucketedSessionSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 30L * 60 * 1000000 // 30 min

  private def plainSummaries(df: org.apache.spark.sql.DataFrame) =
    Windows.sessionize(df, Seq("user_id"), "ts", Gap, col("event_id"))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts_us").as("start_us"), max($"ts_us").as("end_us"),
        count(lit(1)).cast("bigint").as("n_events"))
      .select($"user_id", $"start_us", $"end_us", $"n_events")

  test("bucketed summaries equal the single-window sessionize on real events") {
    val ev = Tables.events(spark, sf).filter($"ts".isNotNull)
    Seq(2L, 6L, 24L).foreach { hours =>
      val bucketed = Windows.sessionSummariesBucketed(
        ev, Seq("user_id"), "ts", Gap, hours * 3600L * 1000000)
      val plain = plainSummaries(ev)
      assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty,
        s"bucketed != plain at bucket = $hours h")
    }
  }

  test("sessions spanning many buckets stitch back into one") {
    // one user, an event every 20 min for 10 h: ONE session crossing
    // every 1-h bucket boundary (20 min < 30-min gap)
    val base = 1700000000000000L
    val rows = (0 until 30).map(i => (7L, i.toLong, base + i * 20L * 60 * 1000000))
    val df = rows.toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros($"us")).drop("us")
    val got = Windows.sessionSummariesBucketed(
        df, Seq("user_id"), "ts", Gap, 3600L * 1000000)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (_, start, end, n) = got.head
    assert(n == 30 && start == base && end == base + 29 * 20L * 60 * 1000000)
  }

  test("hybrid routing equals plain summaries regardless of threshold") {
    val ev = Tables.events(spark, sf).filter($"ts".isNotNull)
    val plain = plainSummaries(ev)
    // threshold 1: everything hot (all-bucketed); huge: everything cold
    Seq(1L, 50L, Long.MaxValue).foreach { thr =>
      val hybrid = Windows.sessionSummariesHybrid(
        ev, Seq("user_id"), "ts", Gap, 6L * 3600 * 1000000, thr)
      assert(hybrid.exceptAll(plain).isEmpty && plain.exceptAll(hybrid).isEmpty,
        s"hybrid != plain at threshold $thr")
    }
  }

  test("bucketed as-of carry equals the single-window form on a skewed fixture") {
    // hot user 0 owns half the rows; markers sparse and irregular so
    // many buckets carry nothing and the cross-bucket fallback is
    // exercised (including events BEFORE any marker -> null carry)
    val base = 1700000000000000L
    val rows = (0L until 4000L).map { i =>
      val user = if (i % 2 == 0) 0L else 1L + (i % 7)
      val ts = base + i * 300000000L + (i % 11) * 7L
      val marker = i % 53 == 0
      (i, user, ts, if (marker) "signup" else "view")
    }
    val df = rows.toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros($"us")).drop("us")
    def marked = when($"event_type" === "signup", unix_micros($"ts"))
    val plain = Windows.asOfCarry(df, Seq("user_id"),
      Seq($"ts".asc, $"event_id".asc), marked, "carry")
    val bucketed = Windows.asOfCarryBucketed(df, Seq("user_id"),
      unix_micros($"ts"), $"event_id", marked, "carry",
      bucketUs = 3600000000L)
    val cols = Seq($"event_id", $"user_id", $"carry")
    assert(bucketed.select(cols: _*).exceptAll(plain.select(cols: _*)).isEmpty &&
      plain.select(cols: _*).exceptAll(bucketed.select(cols: _*)).isEmpty,
      "bucketed carry must be bit-identical to the single window")
    // the events-level window must partition on the bucket too — the
    // whole point; only the per-key BUCKET SUMMARY may window by key
    // alone, and the bucket-final value is a partial-aggregable max
    val p = bucketed.queryExecution.executedPlan.toString
    assert(p.contains("partial_max"),
      s"bucket-final marker lost map-side combine:\n${p.take(3000)}")
    assert("windowspecdefinition\\(user_id#\\d+L, __b".r
      .findFirstIn(p).isDefined,
      s"pass-1 window is not bucket-partitioned:\n${p.take(3000)}")
  }

  test("hybrid as-of routing equals the plain carry regardless of threshold") {
    // same skewed fixture as the bucketed-equality test: hot user 0
    // owns half the rows, seven sparse tails
    val base = 1700000000000000L
    val rows = (0L until 4000L).map { i =>
      val user = if (i % 2 == 0) 0L else 1L + (i % 7)
      val ts = base + i * 300000000L + (i % 11) * 7L
      (i, user, ts, if (i % 53 == 0) "signup" else "view")
    }
    val df = rows.toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros($"us")).drop("us")
    def marked = when($"event_type" === "signup", unix_micros($"ts"))
    val plain = Windows.asOfCarry(df, Seq("user_id"),
      Seq(unix_micros($"ts").asc, $"event_id".asc), marked, "carry")
    val cols = Seq($"event_id", $"user_id", $"carry")
    // threshold 1: all-bucketed; 1000: only user 0 hot (2000 rows vs
    // ~286 per tail user); huge: all-plain — every routing mix must
    // be bit-identical to the single window
    Seq(1L, 1000L, Long.MaxValue).foreach { thr =>
      val hybrid = Windows.asOfCarryHybrid(df, Seq("user_id"),
        unix_micros($"ts"), $"event_id", marked, "carry",
        bucketUs = 3600000000L, hotThreshold = thr)
      assert(hybrid.select(cols: _*).exceptAll(plain.select(cols: _*)).isEmpty &&
        plain.select(cols: _*).exceptAll(hybrid.select(cols: _*)).isEmpty,
        s"hybrid != plain at threshold $thr")
    }
    // at the splitting threshold, BOTH routes carry rows (the routing
    // is real, not degenerate)
    val hot = df.groupBy($"user_id").count().filter($"count" >= 1000L).count()
    assert(hot == 1L, "fixture must route exactly the hot user bucketed")
  }

  test("events exactly gap-apart merge; gap+1us splits (boundary rule parity)") {
    val base = 1700000000000000L
    val df = Seq(
      (1L, 0L, base), (1L, 1L, base + Gap),              // == gap -> merge
      (2L, 2L, base), (2L, 3L, base + Gap + 1))          // > gap -> split
      .toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros($"us")).drop("us")
    val got = Windows.sessionSummariesBucketed(
        df, Seq("user_id"), "ts", Gap, 2 * Gap)
      .groupBy($"user_id").count().as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }
}
