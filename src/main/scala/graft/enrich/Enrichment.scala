package graft.enrich

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** External-enrichment source semantics (SURVEY §2 A4–A8 + J5): the
  * reference's asyncio worker pool, re-expressed on Spark's own task
  * scheduler. One partition = one worker: a lazily-created client per
  * partition (connection reuse, A6), row-level retry with a budget
  * (A6), a partition-local 429 circuit breaker (A7), an inter-request
  * delay (anti-hammering, base_async_processor.py:194-197), and
  * `repartition(n)` as the pool-size knob — `n = 1` reproduces the
  * serial etiquette mode the geo APIs require (A8,
  * parse_data.py:177-182).
  *
  * The [[HttpClient]] seam has a real production binding —
  * [[JdkHttpClient]] over `java.net.http` (integration-tested against
  * an in-process loopback server in JdkHttpClientSpec); oracle queries
  * bind deterministic fakes so the driver can restate the arithmetic.
  */
case class HttpRequest(url: String, requestId: String, method: String,
    params: Map[String, String], headers: Map[String, String] = Map.empty)

case class HttpResponse(requestId: String, status: Int, body: String,
    error: Option[String] = None)

trait HttpClient extends Serializable {
  def execute(req: HttpRequest): HttpResponse
  def close(): Unit = ()
}

object Enrichment {

  /** Process a request frame through a per-partition client.
    *
    * Retry/breaker semantics match the reference: transport failures
    * retry up to `maxRetries` then yield a 599 error row; HTTP 429 is
    * NEVER retried and `breakerThreshold` consecutive 429s open the
    * breaker — every remaining request in the partition fails instantly
    * without touching the network (async_http_processor.py:17-27).
    *
    * Client lifecycle knobs (both default-off, preserving one client
    * per partition):
    *  - `maxTasksPerClient > 0` recreates the client after that many
    *    rows (base_async_processor.py:164-167 `_should_recreate_client`
    *    — connection hygiene, and the release point where a
    *    [[ProxyPool.rotatingFactory]] rotates proxies);
    *  - `rotateOnFailure` recreates the client before each transport
    *    retry — the distributed form of the reference re-enqueueing a
    *    failed task to a worker holding a DIFFERENT proxy (a rotating
    *    factory skips proxies it marked unsuccessful).
    */
  def processRequests(requests: Dataset[HttpRequest],
      clientFactory: () => HttpClient,
      maxConcurrent: Int = 2,
      maxRetries: Int = 5,
      breakerThreshold: Int = 5,
      interRequestDelayMs: Long = 0L,
      rateLimitAcc: Option[org.apache.spark.util.LongAccumulator] = None,
      maxTasksPerClient: Int = 0,
      rotateOnFailure: Boolean = false)
      : Dataset[HttpResponse] = {
    import requests.sparkSession.implicits._
    requests.repartition(math.max(1, maxConcurrent))
      .mapPartitions { it =>
        // close a created client when the task finishes (success OR
        // failure) — the seam where a pooled HTTP impl releases sockets
        var created: HttpClient = null
        var served = 0
        def discardClient(): Unit = if (created != null) {
          try created.close() catch { case _: Exception => () }
          created = null
          served = 0
        }
        def client(): HttpClient = {
          if (maxTasksPerClient > 0 && served >= maxTasksPerClient)
            discardClient()
          if (created == null) created = clientFactory()
          created
        }
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            if (created != null) created.close()
          })
        var consecutive429 = 0
        var breakerOpen = false
        val out = it.map { req =>
          if (breakerOpen) {
            rateLimitAcc.foreach(_.add(1))
            HttpResponse(req.requestId, 429, "", Some("circuit-open"))
          } else {
            if (interRequestDelayMs > 0) Thread.sleep(interRequestDelayMs)
            var attempt = 0
            var result: HttpResponse = null
            while (result == null) {
              try {
                val r = client().execute(req)
                if (r.status == 429) {
                  consecutive429 += 1
                  if (consecutive429 >= breakerThreshold) breakerOpen = true
                  rateLimitAcc.foreach(_.add(1))
                  result = r                    // 429: fail fast, no retry
                } else {
                  consecutive429 = 0
                  result = r
                }
              } catch {
                case e: Exception if attempt < maxRetries =>
                  attempt += 1
                  if (rotateOnFailure) discardClient()
                case e: Exception =>
                  result = HttpResponse(req.requestId, 599, "",
                    Some(s"failed after ${attempt + 1} attempts: ${e.getMessage}"))
              }
            }
            served += 1
            result
          }
        }
        out
      }
  }

  /** Nominatim-shaped geocode request per row (distance.py:9-21). */
  def geocodeRequests(workList: DataFrame): Dataset[HttpRequest] = {
    import workList.sparkSession.implicits._
    workList.select(col("offer_id").cast("string"), col("address"))
      .as[(String, String)].map { case (id, addr) =>
        HttpRequest("https://nominatim.openstreetmap.org/search", id, "GET",
          Map("q" -> addr, "format" -> "json", "countrycodes" -> "ru",
            "addressdetails" -> "1"))
      }
  }

  /** Full distance-enrichment chain (distance.py:38-90): work-list →
    * geocode (serial) → P6 filter + coordinate extract → route (serial)
    * → meters → km(2dp). Both HTTP phases run at concurrency 1 —
    * correctness-over-throughput for rate-limited public APIs.
    *
    * @param fleetAbort429Fraction when set, a FLEET-level breaker
    *        guards the phase boundary: phase 1's 429s are counted in a
    *        LongAccumulator across ALL partitions, phase 1 is
    *        materialized (localCheckpoint — HTTP side effects must not
    *        sit in a re-executable lineage anyway), and if the global
    *        429 fraction reaches the threshold the driver SKIPS phase 2
    *        entirely, returning zero enrichment rows instead of firing
    *        another full pass of doomed requests at a saturated API.
    *        Per-partition breakers (A7) can't see this: each partition
    *        may sit just under its consecutive-429 threshold while the
    *        fleet-wide rate says the API is gone. Accumulator counts
    *        are task-retry-approximate, which is fine for a
    *        rate-estimate decision.
    */
  def distanceChain(workList: DataFrame, refCoords: String,
      clientFactory: () => HttpClient,
      cookieJar: Option[Seq[(String, String)]] = None,
      fleetAbort429Fraction: Option[Double] = None): DataFrame = {
    val spark = workList.sparkSession
    import spark.implicits._

    val acc429 = fleetAbort429Fraction.map(_ =>
      spark.sparkContext.longAccumulator("graft.enrich.fleet429"))
    val geoRaw = processRequests(
      Cookies.withCookies(geocodeRequests(workList), cookieJar),
      clientFactory, maxConcurrent = 1, rateLimitAcc = acc429)
    val geoOrAbort: Option[Dataset[HttpResponse]] =
      fleetAbort429Fraction match {
        case None => Some(geoRaw)
        case Some(frac) =>
          val mat = geoRaw.localCheckpoint()
          val total = mat.count()
          val limited = acc429.get.value
          if (total > 0 && limited.toDouble / total >= frac) {
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"fleet breaker open: $limited/$total geocode requests " +
                s"rate-limited (>= $frac) — skipping route phase")
            None
          } else Some(mat)
      }
    if (geoOrAbort.isEmpty) {
      return spark.emptyDataset[(String, Double)]
        .toDF("offer_id", "distance")
    }
    val geo = geoOrAbort.get
    // P6: keep 200s; JSON-extract first candidate's coordinates;
    // malformed payloads coerce null and drop (distance.py:56-69)
    val coords = geo.toDF()
      .filter(col("status") === 200)
      .select(col("requestId").as("offer_id"),
        get_json_object(col("body"), "$[0].lat").cast("double").as("lat"),
        get_json_object(col("body"), "$[0].lon").cast("double").as("lon"))
      .filter(col("lat").isNotNull && col("lon").isNotNull)

    val routeReqs = coords.select(col("offer_id"), col("lat"), col("lon"))
      .as[(String, Double, Double)].map { case (id, lat, lon) =>
        HttpRequest(
          s"https://routing.openstreetmap.de/routed-foot/route/v1/foot/" +
            s"$refCoords;$lon,$lat", id, "GET",
          Map("overview" -> "false", "alternatives" -> "false"))
      }

    val routes = processRequests(
      Cookies.withCookies(routeReqs, cookieJar), clientFactory,
      maxConcurrent = 1)
    routes.toDF()
      .filter(col("status") === 200)
      .select(col("requestId").as("offer_id"),
        get_json_object(col("body"), "$.routes[0].distance")
          .cast("double").as("meters"))
      .filter(col("meters").isNotNull)
      .select(col("offer_id"),
        graft.functions.Functions.distanceKm(col("meters")).as("distance"))
  }

  /** J5: fold `{offer_id, distance}` back into the master — non-null
    * enrichment wins, same rule the merge applies (distance is the only
    * updated column, so a broadcast left join is the cheap equivalent of
    * the full MERGE; parse_data.py:451-458). */
  def mergeDistance(master: DataFrame, distances: DataFrame): DataFrame =
    master.join(
        broadcast(distances.select(col("offer_id"),
          col("distance").as("__new_distance"))),
        Seq("offer_id"), "left")
      .withColumn("distance",
        coalesce(col("__new_distance"), col("distance")))
      .drop("__new_distance")
}
