package graft.sources

/** K2 — retry with linear backoff, the reference's source-stage
  * reliability wrapper (3 attempts, `sleep(backoff_sec * attempt)`,
  * `/root/reference/src/extract/hn_extract.py:28-48`). Driver-side by
  * design: it guards source/stage boundaries (a fetch, a write), not
  * row-level work — per-row retries belong to Spark's own task retry. */
object Retry {
  def withRetry[T](retries: Int = 3, backoffMs: Long = 1000L,
                   onRetry: (Int, Throwable) => Unit = (_, _) => ())(f: => T): T = {
    require(retries >= 1, s"retries must be >= 1, got $retries")
    var attempt = 0
    var last: Throwable = null
    while (attempt < retries) {
      attempt += 1
      try return f
      catch {
        case e: Throwable =>
          last = e
          onRetry(attempt, e)
          if (attempt < retries) Thread.sleep(backoffMs * attempt)
      }
    }
    throw last
  }
}
