package graft.enrich

/** Proxy-rotation config surface — the reference scraper's proxy pool
  * (scraper_config.py:28 `proxy_configs`, :65-110 per-proxy
  * User-Agent / Accept-Language maps with no-proxy defaults;
  * base_async_processor.py:16 working set = first `max_concurrent+2`
  * configs, :37-51 exclusive per-worker checkout, :170-177 release on
  * client teardown), re-expressed deterministically for Spark's
  * worker pool: the reference's `random.choice` over available
  * proxies becomes checkout-by-`(workerId + rotation) mod n` —
  * reproducible at any parallelism — and "available" excludes proxies
  * marked unsuccessful after a transport failure (the reference drops
  * a proxy whose client dies when the task re-enqueues to another
  * worker).
  *
  * Integration: [[ProxyPool.rotatingFactory]] adapts any proxy-aware
  * client binding into the `() => HttpClient` seam of
  * [[Enrichment.processRequests]]; each factory call — the initial
  * per-partition client, every `maxTasksPerClient` recreation, and
  * (with `rotateOnFailure`) every transport-failure retry — checks
  * out the next proxy and stamps its header identity on every request.
  * Zero-egress note: proxy SELECTION and header identity are fully
  * modeled and loopback-tested; only a live upstream proxy endpoint is
  * environment-bound, like A4's JS rendering.
  */
final case class ProxyConfig(serverName: String, server: String,
    userAgent: Option[String] = None,
    acceptLanguage: Option[String] = None) {
  /** (host, port) parsed from `server` (e.g. "http://1.2.3.4:8080")
    * for bindings that dial the proxy; None when unparseable. */
  def hostPort: Option[(String, Int)] =
    try {
      val u = java.net.URI.create(server)
      if (u.getHost == null || u.getPort < 0) None
      else Some((u.getHost, u.getPort))
    } catch { case _: IllegalArgumentException => None }
}

final case class ProxyPool(
    configs: Seq[ProxyConfig],
    maxConcurrent: Int,
    defaultUserAgent: String = "PythonGeocoder/1.0",
    defaultAcceptLanguage: String =
      "ru-RU,ru;q=0.9,en-US;q=0.8,en;q=0.7") {

  /** Bounded working set (base_async_processor.py:16). */
  val working: Vector[ProxyConfig] =
    configs.take(maxConcurrent + 2).toVector

  /** Deterministic checkout: worker `workerId`'s `rotation`-th client
    * takes `available[(workerId + rotation) mod |available|]` where
    * available = working set minus `unsuccessful`; None when nothing
    * is available (the reference's no-proxy fallback, returning the
    * default header identity). */
  def checkout(workerId: Int, rotation: Int,
      unsuccessful: Set[String]): Option[ProxyConfig] = {
    val avail = working.filterNot(p => unsuccessful(p.serverName))
    if (avail.isEmpty) None
    else Some(avail(math.floorMod(workerId + rotation, avail.size)))
  }

  /** Per-proxy header identity with no-proxy defaults
    * (async_http_processor.py:41-46). */
  def headersFor(p: Option[ProxyConfig]): Map[String, String] = Map(
    "User-Agent" ->
      p.flatMap(_.userAgent).getOrElse(defaultUserAgent),
    "Accept-Language" ->
      p.flatMap(_.acceptLanguage).getOrElse(defaultAcceptLanguage))
}

object ProxyPool {

  /** Adapt a proxy-aware client binding into the worker-pool seam.
    * State (rotation counter, unsuccessful set) lives on the factory
    * closure object, which deserializes once per task — so it is
    * naturally partition-local, the worker-local state of the
    * reference pool. */
  def rotatingFactory(pool: ProxyPool,
      bind: Option[ProxyConfig] => HttpClient): () => HttpClient =
    new RotatingFactory(pool, bind)

  private final class RotatingFactory(pool: ProxyPool,
      bind: Option[ProxyConfig] => HttpClient)
      extends (() => HttpClient) with Serializable {
    @transient private var rotation = 0
    @transient private var bad: scala.collection.mutable.Set[String] = _

    def apply(): HttpClient = {
      if (bad == null) bad = scala.collection.mutable.Set.empty[String]
      val wid = Option(org.apache.spark.TaskContext.get())
        .map(_.partitionId()).getOrElse(0)
      val chosen = pool.checkout(wid, rotation, bad.toSet)
      rotation += 1
      val inner = bind(chosen)
      val hdrs = pool.headersFor(chosen)
      new HttpClient {
        // request headers win over the proxy identity (a caller-pinned
        // Cookie/UA must survive), matching dict-merge order in
        // async_http_processor.py's session options
        def execute(req: HttpRequest): HttpResponse =
          try inner.execute(req.copy(headers = hdrs ++ req.headers))
          catch {
            case e: Throwable =>
              // unsuccessful-proxy tracking: a transport failure marks
              // the proxy so the next checkout skips it
              chosen.foreach(c => bad += c.serverName)
              throw e
          }
        override def close(): Unit = inner.close()
      }
    }
  }
}
