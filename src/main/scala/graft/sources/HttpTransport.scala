package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** The production binding of [[FetchSource.Transport]]: a real HTTP
  * client with the reference extract's wire behavior
  * (`/root/reference/src/extract/hn_extract.py:28-59`):
  *
  *  - per-request timeout (the reference's `timeout=REQUEST_TIMEOUT`);
  *  - non-2xx raises (its `raise_for_status()`) — the exception feeds
  *    [[Retry.withRetry]]'s attempt/backoff envelope, and an exhausted
  *    budget fails the task into Spark's own retry tier;
  *  - a literal `null` body maps to `None` (the reference skips null
  *    items, `hn_extract.py:90-92` — the upstream API returns JSON
  *    `null` for deleted ids).
  *
  * Built on `java.net.http.HttpClient` (JDK 11+, zero extra
  * dependencies). Construct via `makeTransport = () =>
  * HttpTransport.make(urlFor)` so the client — its connection pool and
  * executor — is created ONCE PER PARTITION and amortized across that
  * partition's ids, the [[FetchSource.fetchAll]] mapPartitions
  * economics. FetchSourceSpec drives this class over real sockets
  * against an in-process stub server (the sandbox has no egress; the
  * wire path itself is exercised loopback).
  */
object HttpTransport {

  def make(urlFor: Long => String,
           connectTimeoutMs: Long = 10000L,
           requestTimeoutMs: Long = 10000L): FetchSource.Transport = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(connectTimeoutMs))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    id => {
      val req = HttpRequest.newBuilder(URI.create(urlFor(id)))
        .timeout(Duration.ofMillis(requestTimeoutMs))
        .GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      val sc = resp.statusCode()
      if (sc < 200 || sc >= 300)
        throw new java.io.IOException(s"HTTP $sc for ${urlFor(id)}")
      val body = resp.body()
      if (body == null || body.isEmpty || body.trim == "null") None
      else Some(body)
    }
  }
}
