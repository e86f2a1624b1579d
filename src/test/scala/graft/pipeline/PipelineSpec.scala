package graft.pipeline

import graft.SparkSpec
import graft.parse.ListingParser
import org.apache.spark.sql.functions._
import scala.io.Source

/** Golden parser tests (U1/U2 over committed fixtures) + the minimum
  * end-to-end slice of SURVEY §7.3: parse → flatten → normalize →
  * merge → dashboard view, across two batches with a price change and
  * an unpublish.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): String = {
    val src = Source.fromResource(s"fixtures/$name")(scala.io.Codec.UTF8)
    try src.mkString finally src.close()
  }

  private val ts = "2026-08-12T10:00:00"
  private val asOf = lit("2026-08-12 10:00:00").cast("timestamp")

  test("U2: search page splits into 3 cards with ids, prices, dates") {
    val cards = ListingParser.parseCards(
      fixture("search_page.html"), "https://www.cian.ru/cat.php?p=1", ts)
    assert(cards.length == 3)
    assert(cards.map(_.offer_id) == Seq(Some("1001"), Some("1002"), Some("1003")))
    assert(cards.head.price_value.contains("55 000 ₽/мес."))
    assert(cards.head.updated_date.contains("сегодня 14:30"))
    assert(cards.head.image_urls ==
      Seq("https://images.cdn-cian.ru/a-1.jpg", "https://images.cdn-cian.ru/b-2.jpg"))
    assert(cards.head.rental_period.contains("на год"))
    assert(cards(1).title.contains("1-комн. кв., 32 м², 5/12 этаж"))
    assert(cards(2).updated_date.contains("5 авг 12:00"))
    // page-level summary lands on the page parse, not inside cards
    val page = ListingParser.parse(fixture("search_page.html"), "u", ts)
    assert(page.summary.contains(1062L))
  }

  test("U1: listing page full parse") {
    val p = ListingParser.parse(fixture("listing_page.html"),
      "https://www.cian.ru/rent/flat/1001/", ts)
    assert(p.offer_id.contains("1001"))
    assert(p.price_value.contains("54 000 ₽/мес."))
    assert(p.estimated_price.contains("57 000 ₽"))
    assert(p.updated_date.contains("сегодня 16:45"))
    assert(p.attrs("Срок аренды") == "длительный")
    assert(p.attrs("Общая площадь") == "45,6 м²")
    assert(p.attrs("Ремонт") == "Евроремонт")
    assert(p.features == Seq("Холодильник", "Стиральная машина", "Интернет"))
    assert(p.metro_station.contains("Арбатская"))
    assert(p.offer_stats.exists(_.contains("1234")))
    assert(!p.is_unpublished)
    assert(p.image_urls == Seq("https://images.cdn-cian.ru/full-1.jpg"))
    val unpub = ListingParser.parse(fixture("listing_unpublished.html"),
      "https://www.cian.ru/rent/flat/1001/", ts)
    assert(unpub.is_unpublished)
    val err = ListingParser.parse(fixture("error_404.html"),
      "https://x.ru/rent/flat/9/", ts)
    assert(err.error.contains("404 - Page not found"))
    val rate = ListingParser.parse(fixture("error_429.html"),
      "https://x.ru/rent/flat/9/", ts)
    assert(rate.error.contains("429 - Too many requests"))
  }

  test("end-to-end: two batches through parse→flatten→normalize→merge→view") {
    val empty = Pipeline.emptyMaster(spark)

    // batch 1: the search page inserts 3 listings
    val m1 = Pipeline.processBatch(spark, empty,
      spark.createDataset(Seq(
        RawPage("https://www.cian.ru/cat.php?p=1", fixture("search_page.html")))),
      asOf, ts).localCheckpoint()
    assert(m1.count() == 3)
    val r1 = m1.filter($"offer_id" === "1001").collect().head
    assert(r1.getAs[Double]("price_value") == 55000.0)
    assert(r1.getAs[String]("publication_date") == "2026-08-12 14:30:00")
    assert(r1.getAs[String]("status") == "active")
    assert(r1.getAs[Double]("total_area") == 45.6) // title-derived, ','→'.', F1

    // batch 2: detailed page for 1001 (price drop) — 1002/1003 absent from
    // this batch but it's a listing batch (no unpublish-by-search)
    val m2 = Pipeline.processBatch(spark, m1,
      spark.createDataset(Seq(
        RawPage("https://www.cian.ru/rent/flat/1001/", fixture("listing_page.html")))),
      asOf, ts, updateUnpublishedBySearch = false).localCheckpoint()
    assert(m2.count() == 3)
    val r2 = m2.filter($"offer_id" === "1001").collect().head
    assert(r2.getAs[Double]("price_value") == 54000.0)
    assert(r2.getAs[Long]("total_price_changes") == 1L)
    assert(r2.getAs[String]("price_changes") == "-1000")
    assert(r2.getAs[Double]("total_area") == 45.6)  // label bag wins, parsed
    assert(r2.getAs[Double]("estimated_price") == 57000.0)
    assert(r2.getAs[Boolean]("has_refrigerator"))
    assert(r2.getAs[String]("renovation") == "Евроремонт")
    assert(r2.getAs[String]("metro_station") == "Арбатская")
    assert(r2.getAs[String]("street") == "Тверская ул.")  // normalized
    assert(r2.getAs[String]("address") == "Москва, Тверская ул., 12")
    assert(r2.getAs[Double]("total_views") == 1234.0)

    // batch 3: 1001 unpublished; description must NOT be overwritten (R7)
    val m3 = Pipeline.processBatch(spark, m2,
      spark.createDataset(Seq(
        RawPage("https://www.cian.ru/rent/flat/1001/",
          fixture("listing_unpublished.html")))),
      asOf, ts, updateUnpublishedBySearch = false).localCheckpoint()
    val r3 = m3.filter($"offer_id" === "1001").collect().head
    assert(r3.getAs[Boolean]("is_unpublished"))
    assert(r3.getAs[String]("unpublished_date") == "2026-08-12 08:00:00")
    assert(r3.getAs[String]("description")
      == "Светлая квартира у метро. Полностью меблирована.")
    assert(r3.getAs[String]("status") == "non active")

    // search batch without 1002/1003 → J3 synthesizes unpublish markers
    val m4 = Pipeline.processBatch(spark, m3,
      spark.createDataset(Seq(
        RawPage("https://www.cian.ru/rent/flat/1002/", fixture("listing_page.html")))),
      asOf, ts, updateUnpublishedBySearch = true).localCheckpoint()
    // 1001 was already non-active; 1003 was active and missing → unpublished
    val r1003 = m4.filter($"offer_id" === "1003").collect().head
    assert(r1003.getAs[Boolean]("is_unpublished"))

    // P2 dashboard view keeps active rows
    val view = Pipeline.dashboardView(m2, asOf)
    assert(view.count() == 3)
    val viewAfter = Pipeline.dashboardView(
      m3.withColumn("last_active", lit("2026-07-01 00:00:00")), asOf)
    assert(viewAfter.count() == 2)  // 1001 non-active + stale → dropped
  }

  test("status column derives from is_unpublished (B4)") {
    val p = Pipeline.parsePages(spark,
      spark.createDataset(Seq(RawPage("https://www.cian.ru/rent/flat/5/",
        fixture("listing_unpublished.html")))), ts)
    val n = graft.etl.Normalize(graft.etl.Flatten(p), asOf)
    assert(n.select("status").as[String].collect().head == "non active")
  }
}
