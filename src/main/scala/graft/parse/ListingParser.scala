package graft.parse

import MiniDom._

/** Parsed page record (SURVEY §2 U1 output; FIXTURES.md §1–2 shape).
  * Open-vocabulary label/value pairs stay in `attrs` (Russian keys);
  * `graft.etl.Flatten` promotes the known ones to canonical columns.
  */
case class AddressItem(text: String, href: String)

case class ParsedPage(
    offer_id: Option[String],
    url: String,
    offer_url: Option[String],
    price_value: Option[String],
    estimated_price: Option[String],
    updated_date: Option[String],
    title: Option[String],
    description: Option[String],
    offer_stats: Option[String],
    error: Option[String],
    is_unpublished: Boolean,
    address: Option[String],
    metro_station: Option[String],
    attrs: Map[String, String],
    features: Seq[String],
    image_urls: Seq[String],
    address_items: Seq[AddressItem],
    summary: Option[Long],
    rental_period: Option[String],
    utilities_payment: Option[String],
    commission: Option[String],
    security_deposit: Option[String],
    timestamp: String,
)

/** Scala re-expression of the reference's document→record parser
  * (scraper/html_parser.py:59-221). Selector priority, first-match-wins
  * text fields, label-value bags, geo items, features, gallery rewrite,
  * unpublished flag, summary count — driven by the same data tables.
  * Runs as a Dataset.map function (the one place imperative parsing is
  * the right tool; everything downstream is Column expressions).
  */
object ListingParser {

  private def firstText(html: String, selectors: Seq[(String, String)]): Option[String] =
    selectors.view.flatMap { case (a, v) =>
      findFirst(html, a, v).map(e => text(e._2)).filter(_.nonEmpty)
    }.headOption

  private val offerIdRe = """/rent/flat/(\d+)""".r

  def offerIdFromUrl(url: String): Option[String] =
    offerIdRe.findFirstMatchIn(url).map(_.group(1))

  /** Label-value pairs: first child of `tag` is the label, last is the
    * value (html_parser.py:246-272); label==value skipped for spans. */
  private def labelValuePairs(html: String, containerAttr: String,
      container: String, tag: String): Map[String, String] =
    findAll(html, containerAttr, container).flatMap { case (_, inner) =>
      val kids = childrenByTag(inner, tag).map(text)
      if (kids.length >= 2) {
        val label = kids.head
        val value = kids.last
        if (label.nonEmpty && value.nonEmpty && (tag != "span" || label != value))
          Some(label -> value)
        else None
      } else None
    }.toMap

  def parse(html: String, url: String, timestamp: String): ParsedPage = {
    // first-match-wins priority text fields (html_parser.py:72-90)
    val priceValue = firstText(html, Seq(
      "data-testid" -> "valuation_offerPrice",
      "data-testid" -> "price-amount",
      "data-mark" -> "MainPrice"))
    val updated = firstText(html, Seq(
      "data-testid" -> "metadata-updated-date"))
      .map(_.replace("Обновлено: ", ""))
    val title = firstText(html, Seq(
      "data-mark" -> "OfferSubtitle", "data-mark" -> "OfferTitle"))
    // P8: DOM error classification first (404 AND 429 shapes,
    // parse_listing_page.js:4-50); any other h5.error-code text is still
    // surfaced so the P5 error-row filter drops those pages too.
    val error = ErrorPages.classifyListing(html).orElse {
      val re = """(?s)<h5[^>]*class="[^"]*error-code[^"]*"[^>]*>(.*?)</h5>""".r
      re.findFirstMatchIn(html).map(m => text(m.group(1))).filter(_.nonEmpty)
    }

    // label-value bags (three container kinds), merged in selector order
    val attrs =
      labelValuePairs(html, "data-name", "OfferFactItem", "span") ++
        labelValuePairs(html, "data-name", "ObjectFactoidsItem", "span") ++
        labelValuePairs(html, "data-name", "OfferSummaryInfoItem", "p")

    // geo: metro + address items
    val geo = findFirst(html, "data-name", "Geo").map(_._2)
    val metro = geo.flatMap { g =>
      findFirst(g, "data-name", "UndergroundItem").flatMap { case (_, inner) =>
        childrenByTag(inner, "a").headOption.map(a => text(a).replace("м. ", ""))
      }
    }
    val addressContent = geo.flatMap { g =>
      findFirst(g, "itemprop", "name").flatMap(e => attr(e._1, "content"))
    }.filter(_.nonEmpty)
    val addressItems = findAll(html, "data-name", "AddressItem") ++
      findAll(html, "data-name", "GeoLabel")
    val items = addressItems.map { case (open, inner) =>
      AddressItem(text(inner), attr(open, "href").getOrElse(""))
    }

    val features = findAll(html, "data-name", "FeaturesItem")
      .map(e => text(e._2)).filter(_.nonEmpty)

    val images = findFirst(html, "data-name", "Gallery").toSeq.flatMap {
      case (_, inner) =>
        val imgRe = """<img\b[^>]*src="([^"]*cdn-cian\.ru[^"]*)"""".r
        imgRe.findAllMatchIn(inner).map(_.group(1))
          .map(_.replaceAll("-4\\.jpg$", "-1.jpg")).toSeq
    }

    val summary = findFirst(html, "data-name", "SummaryHeader")
      .map(e => text(e._2)).filter(_.nonEmpty)
      .flatMap { t =>
        """\d+(?:[\s ]\d{3})*""".r.findFirstIn(t)
          .map(_.replaceAll("\\D", "").toLong)
      }

    // LinkArea → offer_url + id override (html_parser.py:203-210)
    val linkUrl = findFirst(html, "data-name", "LinkArea").flatMap {
      case (_, inner) =>
        """<a\b[^>]*href="([^"]*/rent/flat/[^"]*)"""".r
          .findFirstMatchIn(inner).map(_.group(1).replaceAll("/+$", ""))
    }

    val priceInfo = findFirst(html, "data-mark", "PriceInfo")
      .map(e => text(e._2)).filter(_.nonEmpty)
    val priceParts = priceInfo.map(_.split(",", 4)).getOrElse(Array.empty)
    def part(i: Int) = if (priceParts.length > i) Some(priceParts(i)) else None

    val baseOfferId = offerIdFromUrl(url)
    ParsedPage(
      offer_id = linkUrl.flatMap(offerIdFromUrl).orElse(baseOfferId),
      url = url,
      offer_url = linkUrl,
      price_value = priceValue,
      estimated_price = firstText(html,
        Seq("data-testid" -> "valuation_estimationPrice")),
      updated_date = updated,
      title = title,
      description = firstText(html, Seq("data-name" -> "Description")),
      offer_stats = firstText(html, Seq("data-name" -> "OfferStats")),
      error = error,
      is_unpublished = exists(html, "data-name", "OfferUnpublished"),
      address = addressContent,
      metro_station = metro,
      attrs = attrs,
      features = features,
      image_urls = images,
      address_items = items,
      summary = summary,
      rental_period = part(0),
      utilities_payment = part(1),
      commission = part(2),
      security_deposit = part(3),
      timestamp = timestamp,
    )
  }

  /** U2 card splitter: one search page → N card records (each card is a
    * self-contained fragment parsed by U1); a page without an Offers
    * container parses as a single document (parse_data.py:256-281). */
  def parseCards(html: String, url: String, timestamp: String): Seq[ParsedPage] = {
    val offers = findFirst(html, "data-name", "Offers").map(_._2).getOrElse(html)
    val cards = findAll(offers, "data-name", "CardComponent")
    if (cards.isEmpty) Seq(parse(html, url, timestamp))
    else cards.map { case (open, inner) =>
      parse(s"$open$inner</div>", url, timestamp)
    }
  }
}
