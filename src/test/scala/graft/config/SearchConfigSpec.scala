package graft.config

import org.scalatest.funsuite.AnyFunSuite

class SearchConfigSpec extends AnyFunSuite {

  private val yaml =
    """maxprice: 100000
      |district:
      |  - 4
      |  - 21
      |metro:
      |  - 4
      |  - 86
      |rooms: []
      |street:
      |""".stripMargin

  test("YAML predicates compile into the reference URL shape") {
    val cfg = SearchConfig.fromYaml(yaml)
    assert(cfg.maxprice.contains(100000L))
    assert(cfg.district == Seq(4L, 21L))
    assert(cfg.rooms.isEmpty && cfg.street.isEmpty)
    val url = SearchConfig.searchUrl("https://www.cian.ru", cfg)
    assert(url == "https://www.cian.ru/cat.php?currency=2&engine_version=2" +
      "&type=4&deal_type=rent&sort=creation_date_desc&" +
      "maxprice=100000&district[0]=4&district[1]=21&metro[0]=4&metro[1]=86")
  }

  test("rooms expand positionally; key order follows the YAML") {
    val cfg = SearchConfig.fromYaml("rooms:\n  - 1\n  - 3\nmaxprice: 50000\n")
    val url = SearchConfig.searchUrl("https://x", cfg)
    assert(url.endsWith("room1=1&room3=1&maxprice=50000"))
  }

  test("page fan-out and listing urls") {
    assert(SearchConfig.searchPageUrls("https://x/cat.php?a=1", 3) ==
      Seq("https://x/cat.php?a=1&p=1", "https://x/cat.php?a=1&p=2",
        "https://x/cat.php?a=1&p=3"))
    assert(SearchConfig.listingUrls("https://x", Seq("7", "9")) ==
      Seq("https://x/rent/flat/7", "https://x/rent/flat/9"))
  }
}
