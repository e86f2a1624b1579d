package graft.enrich

import java.net.URI
import java.net.URLEncoder
import java.nio.charset.StandardCharsets

/** Production [[HttpClient]] binding over the JDK's built-in
  * `java.net.http` client (JEP 321) — the real-socket implementation of
  * the A5 HTTP JSON source (async_http_processor.py:36-68). No extra
  * dependency: the JDK client ships with Java 11+.
  *
  * The class holds only CONFIG (serializable); the underlying client is
  * built lazily on first use, i.e. on the EXECUTOR after the closure
  * ships — one connection pool per partition via the
  * `() => new JdkHttpClient(...)` factory, exactly the
  * client-per-worker shape of the reference pool.
  *
  * Semantics under [[Enrichment.processRequests]]:
  *  - GET: params become a URL query string (URL-encoded, KEY-SORTED —
  *    Map iteration order is unspecified past 4 entries, and sorted
  *    keys make request URLs deterministic for logging/caching);
  *  - POST: params become a form-encoded body;
  *  - transport failures THROW (connect/read timeout, refused) — the
  *    worker-pool's retry budget and 599 fallback handle them;
  *  - HTTP status is returned as-is — the pool's 429 breaker and the
  *    P6 status filter consume it.
  */
class JdkHttpClient(
    connectTimeoutMs: Long = 10000L,
    requestTimeoutMs: Long = 30000L,
    followRedirects: Boolean = true,
    defaultHeaders: Map[String, String] = Map.empty,
    proxyHostPort: Option[(String, Int)] = None) extends HttpClient {

  @transient private lazy val client: java.net.http.HttpClient = {
    var b = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
    if (followRedirects)
      b = b.followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    // forward-proxy binding for the ProxyPool surface: requests dial
    // the proxy and carry the absolute-form URI (RFC 7230 §5.3.2)
    proxyHostPort.foreach { case (h, p) =>
      b = b.proxy(java.net.ProxySelector.of(
        new java.net.InetSocketAddress(h, p)))
    }
    b.build()
  }

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8)

  private def query(params: Map[String, String]): String =
    params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")

  def execute(req: HttpRequest): HttpResponse = {
    val isPost = req.method.equalsIgnoreCase("POST")
    val uri =
      if (isPost || req.params.isEmpty) URI.create(req.url)
      else URI.create(req.url +
        (if (req.url.contains("?")) "&" else "?") + query(req.params))
    var b = java.net.http.HttpRequest.newBuilder(uri)
      .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
    (defaultHeaders ++ req.headers).foreach { case (k, v) =>
      b = b.header(k, v)
    }
    b = if (isPost)
      b.header("Content-Type", "application/x-www-form-urlencoded")
        .POST(java.net.http.HttpRequest.BodyPublishers
          .ofString(query(req.params)))
    else b.GET()
    val resp = client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    HttpResponse(req.requestId, resp.statusCode(), resp.body())
  }
}
