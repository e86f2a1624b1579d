package graft.enrich

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentHashMap

/** Scripted-client tests for the worker-pool semantics (A6/A7/A8) and
  * the geocode→route distance chain (J5). */
object ScriptedClients {
  // attempt counters shared across (local-mode) tasks per request id
  val attempts = new ConcurrentHashMap[String, Integer]()
  // close() invocations per client class (A6 lifecycle)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Echoes request headers back so cookie attachment is observable. */
  class HeaderEcho extends HttpClient {
    def execute(req: HttpRequest): HttpResponse =
      HttpResponse(req.requestId, 200,
        req.headers.getOrElse("Cookie", ""))
    override def close(): Unit = { closes.incrementAndGet(); () }
  }

  /** Fails with an exception `failures` times per request, then 200. */
  class Flaky(failures: Int) extends HttpClient {
    def execute(req: HttpRequest): HttpResponse = {
      val n = attempts.merge(req.requestId, 1, (a, b) => a + b)
      if (n <= failures) throw new RuntimeException(s"boom $n")
      HttpResponse(req.requestId, 200, s"""{"ok": true}""")
    }
  }

  /** Always 429 — drives the circuit breaker. */
  class RateLimited extends HttpClient {
    def execute(req: HttpRequest): HttpResponse = {
      attempts.merge(req.requestId, 1, (a, b) => a + b)
      HttpResponse(req.requestId, 429, "")
    }
  }

  /** Deterministic fake geo services: geocode returns coordinates from
    * the address text; route returns meters from the url length. */
  class FakeGeo extends HttpClient {
    def execute(req: HttpRequest): HttpResponse =
      if (req.url.contains("nominatim")) {
        val a = req.params("q")
        if (a.contains("bad")) HttpResponse(req.requestId, 200, "[]")
        else HttpResponse(req.requestId, 200,
          s"""[{"lat": "55.7${a.length}", "lon": "37.6${a.length}"}]""")
      } else {
        HttpResponse(req.requestId, 200,
          s"""{"routes": [{"distance": ${req.url.length * 10}}]}""")
      }
  }
}

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private def reqs(ids: String*) = spark.createDataset(
    ids.map(i => HttpRequest(s"https://x/$i", i, "GET", Map.empty)))

  test("transport failures retry up to budget, then 599") {
    ScriptedClients.attempts.clear()
    val ok = Enrichment.processRequests(reqs("a", "b"),
      () => new ScriptedClients.Flaky(2), maxConcurrent = 1, maxRetries = 5)
    assert(ok.collect().forall(_.status == 200))
    assert(ScriptedClients.attempts.get("a") == 3)   // 2 failures + 1 success

    ScriptedClients.attempts.clear()
    val exhausted = Enrichment.processRequests(reqs("c"),
      () => new ScriptedClients.Flaky(99), maxConcurrent = 1, maxRetries = 2)
    val r = exhausted.collect().head
    assert(r.status == 599 && r.error.exists(_.contains("after 3 attempts")))
  }

  test("circuit breaker: 5 consecutive 429s fail the rest instantly") {
    ScriptedClients.attempts.clear()
    val ids = (1 to 20).map(_.toString)
    val out = Enrichment.processRequests(reqs(ids: _*),
      () => new ScriptedClients.RateLimited(),
      maxConcurrent = 1, breakerThreshold = 5).collect()
    assert(out.forall(_.status == 429))
    // only the first 5 hit the "network"; the rest were circuit-open
    assert(ScriptedClients.attempts.size == 5)
    assert(out.count(_.error.contains("circuit-open")) == 15)
  }

  test("A12 cookies: file jar loads, degrades on garbage, reaches requests") {
    val f = java.nio.file.Files.createTempFile("graft_cookies", ".json")
    java.nio.file.Files.writeString(f,
      """[{"name":"sid","value":"abc","domain":".cian.ru"},
        |{"name":"tz","value":"utc"},{"novalue":1}]""".stripMargin)
    val jar = Cookies.load(Some(f.toString), useCookies = true)
    assert(jar.contains(Seq("sid" -> "abc", "tz" -> "utc")))
    assert(Cookies.headerValue(jar.get) == "sid=abc; tz=utc")
    // disabled / missing / corrupt → None, never a failure
    assert(Cookies.load(Some(f.toString), useCookies = false).isEmpty)
    assert(Cookies.load(Some("/nonexistent.json"), useCookies = true).isEmpty)
    val bad = java.nio.file.Files.createTempFile("graft_cookies_bad", ".json")
    java.nio.file.Files.writeString(bad, "{not json")
    assert(Cookies.load(Some(bad.toString), useCookies = true).isEmpty)

    val out = Enrichment.processRequests(
      Cookies.withCookies(reqs("a", "b"), jar),
      () => new ScriptedClients.HeaderEcho(), maxConcurrent = 1).collect()
    assert(out.forall(_.body == "sid=abc; tz=utc"))
    // no jar → untouched requests
    val plain = Enrichment.processRequests(
      Cookies.withCookies(reqs("c"), None),
      () => new ScriptedClients.HeaderEcho(), maxConcurrent = 1).collect()
    assert(plain.head.body == "")
  }

  test("per-partition client is closed on task completion") {
    ScriptedClients.closes.set(0)
    Enrichment.processRequests(reqs("a", "b", "c"),
      () => new ScriptedClients.HeaderEcho(), maxConcurrent = 2).collect()
    // one client per non-empty partition, each closed exactly once
    val n = ScriptedClients.closes.get()
    assert(n >= 1 && n <= 2, s"expected 1-2 closes, got $n")
  }

  test("distance chain: geocode→route→km with malformed-payload drops") {
    val work = Seq(("1", "Москва, Тверская ул., 12"), ("2", "bad address"),
      ("3", "Москва, Арбат, 1")).toDF("offer_id", "address")
    val dist = Enrichment.distanceChain(work, "37.6,55.7",
      () => new ScriptedClients.FakeGeo())
    val rows = dist.as[(String, Double)].collect().toMap
    assert(rows.keySet == Set("1", "3"))       // "bad" geocode → dropped (P6)
    assert(rows.values.forall(_ > 0))

    val master = Seq(("1", Option.empty[Double]), ("2", Some(9.99)),
      ("3", Option.empty[Double])).toDF("offer_id", "distance")
    val merged = Enrichment.mergeDistance(master, dist)
      .as[(String, Option[Double])].collect().toMap
    assert(merged("1").contains(rows("1")))
    assert(merged("2").contains(9.99))         // null enrichment never clears
  }

  test("fleet breaker: saturated phase 1 aborts phase 2; healthy run unaffected") {
    val work = (1 to 40).map(i => (i.toString, s"addr $i"))
      .toDF("offer_id", "address")
    val aborted = Enrichment.distanceChain(work, "37.6,55.7",
      () => new ScriptedClients.RateLimited(),
      fleetAbort429Fraction = Some(0.5))
    assert(aborted.count() == 0)
    assert(aborted.columns.toSeq == Seq("offer_id", "distance"))

    val healthy = Enrichment.distanceChain(work, "37.6,55.7",
      () => new ScriptedClients.FakeGeo(),
      fleetAbort429Fraction = Some(0.5))
    assert(healthy.count() == 40)              // guard silent below threshold
  }
}
