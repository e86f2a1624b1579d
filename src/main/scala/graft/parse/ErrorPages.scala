package graft.parse

import MiniDom._

/** Error-page DOM classification + the search-summary extractor, the two
  * fidelity slivers of SURVEY §2 P8 and U5.
  *
  * Two distinct classifier orders exist in the reference and both are
  * kept: the listing page checks 404 markers before 429
  * (scraper/js/parse_listing_page.js:4-50), while the summary script
  * checks 429 first and knows fewer 404 shapes
  * (scraper/js/extract_summary.js:5-29). The returned strings are the
  * reference's thrown messages verbatim — downstream filters key on
  * their "404"/"429" prefixes.
  */
object ErrorPages {

  val Err404 = "404 - Page not found"
  val Err429 = "429 - Too many requests"

  private def title(html: String): Option[String] =
    """(?s)<title\b[^>]*>(.*?)</title>""".r.findFirstMatchIn(html)
      .map(m => text(m.group(1)))

  private def bodyTextLower(html: String): String = {
    val body = """(?s)<body\b[^>]*>(.*)</body>""".r.findFirstMatchIn(html)
      .map(_.group(1)).getOrElse(html)
    text(body).toLowerCase
  }

  private def h5ErrorCode(html: String): Option[String] =
    findAllByClassToken(html, "error-code")
      .collectFirst { case (open, inner) if open.startsWith("<h5") => text(inner) }

  private def headerCode(html: String): Option[String] =
    findAllByClassToken(html, "header__code").headOption.map(e => text(e._2))

  /** Listing-page order (parse_listing_page.js:4-50): three 404 shapes
    * first — h5.error-code, title patterns, h1.title "Страница не
    * найдена" — then the three 429 shapes. */
  def classifyListing(html: String): Option[String] = {
    val t = title(html)
    if (h5ErrorCode(html).exists(_.contains("404"))) Some(Err404)
    else if (t.exists(s => s.contains("Ошибка 404") || s.contains("Error 404") ||
        s == "404" || s.matches("""(?s)404\s.*""") ||
        s.matches("""(?s).*\s404""") || s.matches("""(?s).*\s404\s.*""")))
      Some(Err404)
    else if (findAllByClassToken(html, "title")
        .exists { case (open, inner) =>
          open.startsWith("<h1") && text(inner).contains("Страница не найдена") })
      Some(Err404)
    else if (headerCode(html).exists(_.trim == "429")) Some(Err429)
    else if (t.exists(s => s.trim == "429" || s.contains("429 "))) Some(Err429)
    else if (bodyTextLower(html).contains("too many requests")) Some(Err429)
    else None
  }

  /** Summary-script order (extract_summary.js:5-29): 429 shapes first
    * (header code, any "429" in the title, body message), then the one
    * 404 shape it knows. */
  def classifySummary(html: String): Option[String] = {
    if (headerCode(html).contains("429")) Some(Err429)
    else if (title(html).exists(_.contains("429"))) Some(Err429)
    else if (bodyTextLower(html).contains("too many requests")) Some(Err429)
    else if (h5ErrorCode(html).exists(_.contains("404"))) Some(Err404)
    else None
  }

  // JS \s includes NBSP (Java's doesn't) — [\s ] keeps parity.
  private val summaryRe =
    """Найдено[\s ]+(\d+)[\s ]+объявлени[еяй]""".r

  /** U5 summary extractor with the reference's full fallback chain
    * (extract_summary.js:32-94): error classification, then
    * (1) the count pattern inside a LEAF element's text, then
    * (2) the pattern anywhere in an h5's textContent (descendants
    * included — catches markup-split counts a leaf walk misses), then
    * (3) counting offer cards, which the reference deliberately
    * discards (cards-per-page ≠ total, extract_summary.js:74-82), so a
    * card-only page still fails with its "could not extract" message. */
  def extractSummary(html: String): Either[String, Long] =
    classifySummary(html) match {
      case Some(err) => Left(err)
      case None =>
        val m1 = textRuns(html).view
          .flatMap(summaryRe.findFirstMatchIn).headOption
        val m2 = m1.orElse(childrenByTag(html, "h5").view
          .map(text).flatMap(summaryRe.findFirstMatchIn).headOption)
        m2.map(_.group(1).toLong)
          .toRight("Could not extract total listings count from page")
    }
}
