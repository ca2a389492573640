package graft

import java.util.concurrent.ConcurrentHashMap
import graft.sources.FetchSource

/** Distributed fetch source (SURVEY A1-A3): fan-out, per-partition
  * transport, retry envelope, empty-response skip. */
class FetchSourceSpec extends SparkSpec {
  import spark.implicits._

  test("fetches fan out, flaky ids succeed after retries, empties are skipped") {
    FetchSourceSpec.attempts.clear()
    val ids = (1L to 100L)
    val got = FetchSource.fetchAll(spark, ids, parallelism = 4,
        makeTransport = () => FetchSourceSpec.flakyTransport,
        retries = 3, backoffMs = 1L)
      .collect()
    // ids % 10 == 0 return None (skipped); the rest succeed, including
    // ids % 7 == 0 which fail twice before succeeding
    val expected = ids.filterNot(_ % 10 == 0).toSet
    assert(got.map(_.id).toSet == expected)
    assert(got.forall(f => f.payload == s"payload-${f.id}"))
    val flaky = ids.filter(i => i % 7 == 0 && i % 10 != 0)
    flaky.foreach { i =>
      assert(FetchSourceSpec.attempts.get(i) == 3, s"id $i retried wrong count")
    }
  }

  test("an id that exhausts its retry budget fails the job (no silent loss)") {
    intercept[org.apache.spark.SparkException] {
      FetchSource.fetchAll(spark, Seq(13L), parallelism = 1,
        makeTransport = () => (_: Long) => throw new RuntimeException("down"),
        retries = 2, backoffMs = 1L).collect()
    }
  }
}

object FetchSourceSpec {
  // executor-side state: single-JVM local mode shares this map, letting
  // the spec observe per-id attempt counts across "partitions"
  val attempts = new ConcurrentHashMap[Long, Integer]()

  def flakyTransport: FetchSource.Transport = { id =>
    val n = attempts.merge(id, 1, (a, b) => a + b)
    if (id % 7 == 0 && n < 3) throw new RuntimeException(s"transient for $id")
    if (id % 10 == 0) None else Some(s"payload-$id")
  }
}
