package graft.enrich

import graft.SparkSpec
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Proxy-rotation surface: deterministic checkout over the bounded
  * working set, per-proxy header identity, unsuccessful-proxy
  * tracking, client recreation cadence — and a REAL forward-proxy
  * round trip: a loopback server acting as the proxy observes the
  * JDK client dialing it with the absolute-form request URI.
  */
class ProxyPoolSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(f: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.start()
      f(server, server.getAddress.getPort)
    } finally server.stop(0)
  }

  private def respond(x: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.sendResponseHeaders(status, bytes.length)
    x.getResponseBody.write(bytes)
    x.close()
  }

  private def cfg(n: Int) =
    ProxyConfig(s"p$n", s"http://10.0.0.$n:8080")

  test("working set truncates to maxConcurrent+2 and checkout is " +
    "deterministic modulo the available proxies") {
    val pool = ProxyPool((1 to 9).map(cfg), maxConcurrent = 2)
    assert(pool.working.map(_.serverName) == Vector("p1", "p2", "p3", "p4"))
    // worker 0 walks the ring; worker 1 starts one step ahead
    assert(pool.checkout(0, 0, Set.empty).map(_.serverName).contains("p1"))
    assert(pool.checkout(0, 1, Set.empty).map(_.serverName).contains("p2"))
    assert(pool.checkout(1, 0, Set.empty).map(_.serverName).contains("p2"))
    assert(pool.checkout(0, 4, Set.empty).map(_.serverName).contains("p1"))
    // unsuccessful proxies leave the ring; all-bad → no-proxy fallback
    assert(pool.checkout(0, 0, Set("p1", "p3"))
      .map(_.serverName).contains("p2"))
    assert(pool.checkout(0, 0, Set("p1", "p2", "p3", "p4")).isEmpty)
  }

  test("header identity: per-proxy UA/Accept-Language with no-proxy " +
    "defaults, and caller headers win") {
    val pool = ProxyPool(Seq(
      ProxyConfig("p1", "http://10.0.0.1:8080",
        userAgent = Some("UA-1"), acceptLanguage = Some("en-US"))),
      maxConcurrent = 1)
    assert(pool.headersFor(Some(pool.working.head)) ==
      Map("User-Agent" -> "UA-1", "Accept-Language" -> "en-US"))
    assert(pool.headersFor(None) == Map(
      "User-Agent" -> "PythonGeocoder/1.0",
      "Accept-Language" -> "ru-RU,ru;q=0.9,en-US;q=0.8,en;q=0.7"))
    assert(ProxyConfig("p", "http://1.2.3.4:8080").hostPort
      .contains(("1.2.3.4", 8080)))
    assert(ProxyConfig("p", "not a url").hostPort.isEmpty)
  }

  test("forward proxy round trip: the JDK client dials the loopback " +
    "proxy with the absolute-form URI and the pool's UA stamped") {
    withServer { (server, port) =>
      server.createContext("/", (x: HttpExchange) =>
        respond(x, 200,
          s"""{"line":"${x.getRequestURI}",""" +
            s""""ua":"${Option(x.getRequestHeaders.getFirst("User-Agent"))
              .getOrElse("")}"}"""))
      val pool = ProxyPool(Seq(
        ProxyConfig("loop", s"http://127.0.0.1:$port",
          userAgent = Some("UA-loop"))), maxConcurrent = 1)
      val factory = ProxyPool.rotatingFactory(pool,
        p => new JdkHttpClient(connectTimeoutMs = 2000,
          proxyHostPort = p.flatMap(_.hostPort)))
      val reqs = spark.createDataset(Seq(
        HttpRequest("http://origin.invalid/listing?page=1", "r1", "GET",
          Map.empty)))
      val out = Enrichment.processRequests(reqs, factory,
        maxConcurrent = 1).collect().head
      assert(out.status == 200)
      // absolute-form proves the request went THROUGH the proxy, not
      // to the (nonexistent) origin
      assert(out.body.contains("http://origin.invalid/listing?page=1"))
      assert(out.body.contains(""""ua":"UA-loop""""))
    }
  }

  test("unsuccessful proxy is skipped on rotate-on-failure retry: a " +
    "dead proxy marks bad and the retry succeeds via the live one") {
    withServer { (server, port) =>
      server.createContext("/", (x: HttpExchange) =>
        respond(x, 200, "via-live"))
      val deadPort = {
        val s = new java.net.ServerSocket(0); val p = s.getLocalPort
        s.close(); p
      }
      val pool = ProxyPool(Seq(
        ProxyConfig("dead", s"http://127.0.0.1:$deadPort"),
        ProxyConfig("live", s"http://127.0.0.1:$port")),
        maxConcurrent = 1)
      val factory = ProxyPool.rotatingFactory(pool,
        p => new JdkHttpClient(connectTimeoutMs = 500,
          proxyHostPort = p.flatMap(_.hostPort)))
      val reqs = spark.createDataset(Seq(
        HttpRequest("http://origin.invalid/x", "r1", "GET", Map.empty)))
      // partition 0, rotation 0 → "dead" (refused, marked bad) →
      // retry recreates the client → checkout skips bad → "live"
      val out = Enrichment.processRequests(reqs, factory,
        maxConcurrent = 1, maxRetries = 3, rotateOnFailure = true)
        .collect().head
      assert(out.status == 200)
      assert(out.body == "via-live")
    }
  }

  test("maxTasksPerClient recreates the client every N rows (the " +
    "proxy release/rotate point)") {
    // counters live on a static object — closures serialize per task,
    // so instance fields would count on a task-local copy (the
    // ScriptedClients convention in EnrichmentSpec)
    ProxyPoolSpec.creations.set(0)
    ProxyPoolSpec.closes.set(0)
    val factory: () => HttpClient = () => {
      ProxyPoolSpec.creations.incrementAndGet()
      new HttpClient {
        def execute(req: HttpRequest): HttpResponse =
          HttpResponse(req.requestId, 200, "ok")
        override def close(): Unit =
          { ProxyPoolSpec.closes.incrementAndGet(); () }
      }
    }
    val reqs = spark.createDataset((1 to 5).map(i =>
      HttpRequest("http://x.invalid/", s"r$i", "GET", Map.empty)))
    val out = Enrichment.processRequests(reqs, factory,
      maxConcurrent = 1, maxTasksPerClient = 2).collect()
    assert(out.length == 5 && out.forall(_.status == 200))
    // ceil(5/2) = 3 clients; every one closed (2 rotations + task end)
    assert(ProxyPoolSpec.creations.get() == 3)
    assert(ProxyPoolSpec.closes.get() == 3)
  }
}

object ProxyPoolSpec {
  val creations = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
}
