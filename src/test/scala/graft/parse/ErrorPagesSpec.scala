package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Fixture coverage for the two reference classifier orders (P8) and the
  * summary extractor's three fallbacks (U5). */
class ErrorPagesSpec extends AnyFunSuite {

  private def page(title: String = "", body: String = "") =
    s"<html><head><title>$title</title></head><body>$body</body></html>"

  // ---- classifyListing: parse_listing_page.js:4-50 order (404 first)

  test("listing: h5.error-code 404 wins over a 429 header code") {
    val html = page(body =
      """<h5 class="big error-code">Ошибка 404</h5>
        |<div class="header__code">429</div>""".stripMargin)
    assert(ErrorPages.classifyListing(html).contains(ErrorPages.Err404))
  }

  test("listing: 404 title patterns match; substrings inside words do not") {
    assert(ErrorPages.classifyListing(page(title = "404")).contains(ErrorPages.Err404))
    assert(ErrorPages.classifyListing(page(title = "404 Not Found")).contains(ErrorPages.Err404))
    assert(ErrorPages.classifyListing(page(title = "Страница 404")).contains(ErrorPages.Err404))
    assert(ErrorPages.classifyListing(page(title = "Ошибка 404 на сайте")).contains(ErrorPages.Err404))
    assert(ErrorPages.classifyListing(page(title = "id1404 квартира")).isEmpty)
  }

  test("listing: h1.title 'Страница не найдена' classifies as 404") {
    val html = page(body = """<h1 class="title">Страница не найдена</h1>""")
    assert(ErrorPages.classifyListing(html).contains(ErrorPages.Err404))
  }

  test("listing: header__code 429, '429 ' title, and body message classify as 429") {
    assert(ErrorPages.classifyListing(
      page(body = """<div class="header__code"> 429 </div>"""))
      .contains(ErrorPages.Err429))
    assert(ErrorPages.classifyListing(page(title = "429 Too Many"))
      .contains(ErrorPages.Err429))
    assert(ErrorPages.classifyListing(
      page(body = "<p>Rate limited: Too Many Requests, retry later</p>"))
      .contains(ErrorPages.Err429))
    assert(ErrorPages.classifyListing(page(title = "Обычная страница",
      body = "<p>ok</p>")).isEmpty)
  }

  // ---- classifySummary: extract_summary.js:5-29 order (429 first)

  test("summary: 429 header code wins over an error-code 404") {
    val html = page(body =
      """<div class="header__code">429</div><h5 class="error-code">404</h5>""")
    assert(ErrorPages.classifySummary(html).contains(ErrorPages.Err429))
    assert(ErrorPages.classifySummary(
      page(body = """<h5 class="error-code">404</h5>"""))
      .contains(ErrorPages.Err404))
  }

  test("summary: ANY 429 in the title classifies (looser than listing)") {
    val html = page(title = "квартира-4290")
    assert(ErrorPages.classifySummary(html).contains(ErrorPages.Err429))
    assert(ErrorPages.classifyListing(html).isEmpty)
  }

  // ---- extractSummary: extract_summary.js:32-94 fallbacks

  test("summary method 1: count inside a leaf element") {
    val html = page(body =
      """<div><h3>Найдено 62 объявления</h3></div>""")
    assert(ErrorPages.extractSummary(html) == Right(62L))
  }

  test("summary method 1 handles NBSP whitespace like JS \\s") {
    val html = page(body = "<h3>Найдено 5 объявлений</h3>")
    assert(ErrorPages.extractSummary(html) == Right(5L))
  }

  test("summary method 2: markup-split count only an h5 walk catches") {
    // no single leaf holds the whole pattern → method 1 misses it;
    // the h5's textContent (descendants included) matches
    val html = page(body =
      """<h5>Найдено <b>951</b> объявлений</h5>""")
    assert(ErrorPages.extractSummary(html) == Right(951L))
  }

  test("summary method 3: cards alone cannot give a total → error") {
    val html = page(body =
      """<div data-name="Offers"><div data-name="CardComponent">a</div>
        |<div data-name="CardComponent">b</div></div>""".stripMargin)
    assert(ErrorPages.extractSummary(html) ==
      Left("Could not extract total listings count from page"))
  }

  test("summary: error page short-circuits extraction") {
    val html = page(title = "429", body = "<h3>Найдено 62 объявления</h3>")
    assert(ErrorPages.extractSummary(html) == Left(ErrorPages.Err429))
  }
}
