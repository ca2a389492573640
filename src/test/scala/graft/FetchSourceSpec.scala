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

  test("production HttpTransport over real sockets: payloads, null-skip, 500-retry, exhausted budget") {
    // in-process stub server (loopback — the sandbox has no egress,
    // the wire path is still the real JDK client against real HTTP):
    //   /item/<id>.json → payload; %10==0 → literal null (the deleted-
    //   item shape, must map to a SKIP); %7==0 → 500 twice, then 200
    //   (reference parity for timeout/retry/backoff, hn_extract 28-48)
    val hits = new ConcurrentHashMap[Long, Integer]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/item/", { ex =>
      val id = ex.getRequestURI.getPath
        .stripPrefix("/item/").stripSuffix(".json").toLong
      val n = hits.merge(id, 1, (a, b) => a + b)
      val (code, body) =
        if (id % 7 == 0 && id % 10 != 0 && n < 3) (500, "transient")
        else if (id % 10 == 0) (200, "null")
        else (200, s"""{"id":$id,"title":"item $id"}""")
      val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val port = server.getAddress.getPort
    try {
      val ids = (1L to 60L)
      val got = FetchSource.fetchAll(spark, ids, parallelism = 4,
          makeTransport = () => graft.sources.HttpTransport.make(
            id => s"http://127.0.0.1:$port/item/$id.json",
            requestTimeoutMs = 5000L),
          retries = 3, backoffMs = 1L)
        .collect()
      val expected = ids.filterNot(_ % 10 == 0).toSet
      assert(got.map(_.id).toSet == expected,
        "null bodies must be skipped, everything else fetched")
      assert(got.forall(f =>
        f.payload == s"""{"id":${f.id},"title":"item ${f.id}"}"""))
      // the 500-then-200 ids must have been retried over the wire
      ids.filter(i => i % 7 == 0 && i % 10 != 0).foreach { i =>
        assert(hits.get(i) == 3, s"id $i hit the server ${hits.get(i)} times")
      }
      // single-shot ids were fetched exactly once (no hidden re-fetch)
      ids.filter(i => i % 7 != 0 && i % 10 != 0).foreach { i =>
        assert(hits.get(i) == 1, s"id $i hit the server ${hits.get(i)} times")
      }
      // a permanently-500 endpoint exhausts the budget and FAILS —
      // the no-silent-loss contract through the real client
      val always500 = server.createContext("/dead/", { ex =>
        ex.sendResponseHeaders(500, 4L)
        ex.getResponseBody.write("dead".getBytes)
        ex.close()
      })
      intercept[org.apache.spark.SparkException] {
        FetchSource.fetchAll(spark, Seq(99L), parallelism = 1,
          makeTransport = () => graft.sources.HttpTransport.make(
            id => s"http://127.0.0.1:$port/dead/$id.json"),
          retries = 2, backoffMs = 1L).collect()
      }
      server.removeContext(always500)
    } finally server.stop(0)
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
