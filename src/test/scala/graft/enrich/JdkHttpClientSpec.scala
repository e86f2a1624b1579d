package graft.enrich

import graft.SparkSpec
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** REAL-socket integration of the A5 source: an in-process loopback
  * HTTP server (no egress — 127.0.0.1 only) exercises the JDK client
  * through the actual worker-pool path: per-partition client, query
  * encoding, header passthrough, status propagation into the breaker,
  * transport-failure retry into 599.
  */
class JdkHttpClientSpec extends SparkSpec {
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

  test("GET with params and headers round-trips through the worker pool") {
    withServer { (server, port) =>
      server.createContext("/echo", (x: HttpExchange) =>
        respond(x, 200,
          s"""{"q":"${x.getRequestURI.getQuery}",""" +
            s""""cookie":"${Option(x.getRequestHeaders.getFirst("Cookie")).getOrElse("")}"}"""))
      val reqs = spark.createDataset(Seq(
        HttpRequest(s"http://127.0.0.1:$port/echo", "r1", "GET",
          Map("q" -> "a b", "page" -> "2"),
          Map("Cookie" -> "session=7"))))
      val out = Enrichment.processRequests(reqs,
        () => new JdkHttpClient(), maxConcurrent = 1)
        .collect().head
      assert(out.status == 200)
      assert(out.body.contains("page=2&q=a+b"))   // key-sorted query
      assert(out.body.contains(""""cookie":"session=7""""))
    }
  }

  test("status codes propagate: 404 passes through, 429s open the breaker") {
    withServer { (server, port) =>
      server.createContext("/limited", (x: HttpExchange) =>
        respond(x, 429, ""))
      val reqs = spark.createDataset((1 to 8).map(i =>
        HttpRequest(s"http://127.0.0.1:$port/limited", s"r$i", "GET",
          Map.empty)))
      val out = Enrichment.processRequests(reqs,
          () => new JdkHttpClient(), maxConcurrent = 1,
          breakerThreshold = 5)
        .collect()
      assert(out.forall(_.status == 429))
      assert(out.count(_.error.contains("circuit-open")) == 3)
    }
  }

  test("transport failure exhausts the retry budget into a 599 row") {
    // a port with no listener: connection refused = transport exception
    val deadPort = {
      val s = new java.net.ServerSocket(0); val p = s.getLocalPort
      s.close(); p
    }
    val reqs = spark.createDataset(Seq(
      HttpRequest(s"http://127.0.0.1:$deadPort/", "r1", "GET", Map.empty)))
    val out = Enrichment.processRequests(reqs,
        () => new JdkHttpClient(connectTimeoutMs = 500),
        maxConcurrent = 1, maxRetries = 2)
      .collect().head
    assert(out.status == 599)
    assert(out.error.exists(_.contains("failed after 3 attempts")))
  }

  test("fetch→parse end-to-end: real sockets feed the real parser") {
    def fixture(name: String): String = {
      val src = scala.io.Source
        .fromResource(s"fixtures/$name")(scala.io.Codec.UTF8)
      try src.mkString finally src.close()
    }
    withServer { (server, port) =>
      server.createContext("/rent/flat/1001/", (x: HttpExchange) =>
        respond(x, 200, fixture("listing_page.html")))
      server.createContext("/gone", (x: HttpExchange) =>
        respond(x, 404, ""))
      val urls = Seq(s"http://127.0.0.1:$port/rent/flat/1001/",
        s"http://127.0.0.1:$port/gone").toDF("url")
      val pages = graft.pipeline.Pipeline.fetchPages(urls,
        () => new JdkHttpClient())
      val parsed = graft.pipeline.Pipeline.parsePages(spark, pages,
        "2026-08-12T10:00:00")
      val ok = graft.pipeline.Pipeline.filterParsed(parsed)
        .select($"offer_id", $"price_value").as[(String, String)]
        .collect()
      assert(ok.toSeq == Seq(("1001", "54 000 ₽/мес.")))
    }
  }

  test("POST form body reaches the server") {
    withServer { (server, port) =>
      server.createContext("/form", (x: HttpExchange) => {
        val body = new String(x.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        respond(x, 200, s"""{"body":"$body"}""")
      })
      val reqs = spark.createDataset(Seq(
        HttpRequest(s"http://127.0.0.1:$port/form", "r1", "POST",
          Map("format" -> "json", "text" -> "hi there"))))
      val out = Enrichment.processRequests(reqs,
        () => new JdkHttpClient(), maxConcurrent = 1)
        .collect().head
      assert(out.status == 200)
      assert(out.body.contains("format=json&text=hi+there"))
    }
  }
}
