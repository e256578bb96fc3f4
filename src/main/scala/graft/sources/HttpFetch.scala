package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** The real HTTP ingest boundary (reference: grocery_ingest_dag.py:36-47
  * — httpx GET with a 10 s timeout; status >= 400 raises so the task's
  * retry envelope re-fetches). Plain `java.net.http` (JDK 11+) — no
  * extra dependency; connect and request timeouts are both pinned so a
  * hung upstream fails the task instead of wedging it.
  */
object HttpFetch {

  final case class HttpStatusError(status: Int, body: String)
    extends RuntimeException(
      s"mock_pos_api_error status=$status body=${body.take(200)}")

  /** Connection-establishment bound, separate from the per-request
    * deadline so the worst case is connectTimeout + request timeout by
    * DESIGN, not an accident of reusing one knob for both.
    */
  private val ConnectTimeoutMs = 5000L

  /** One shared client (and connection pool) per JVM — rebuilding the
    * client per call (worse: per retry attempt) discards pooled
    * connections exactly when a retry wants to reuse them.
    */
  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(ConnectTimeoutMs))
    .build()

  /** GET `url`, returning the body; >= 400 raises [[HttpStatusError]]
    * (retryable), timeouts raise `java.net.http.HttpTimeoutException`.
    * `timeoutMs` is the REQUEST deadline (connect is bounded separately
    * by [[ConnectTimeoutMs]]).
    */
  def get(url: String, timeoutMs: Long = 10000L): String = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs))
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 400) throw HttpStatusError(resp.statusCode(), resp.body())
    resp.body()
  }

  /** GET with the ingest task's retry envelope (C4: fixed backoff,
    * retryable 500s — DAG default_args retries, grocery_ingest_dag.py:
    * 70-75).
    */
  def getWithRetry(url: String, retries: Int, delayMs: Long,
      timeoutMs: Long = 10000L): String =
    graft.etl.Retry(retries, delayMs)(get(url, timeoutMs))
}
