package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTTP response-message split for WARC `response` payloads — the
  * step between [[WarcReader]] and any content pipeline: a crawl
  * record's payload is `status line + headers + CRLF CRLF + body`,
  * and downstream text processing wants (status, content-type, body).
  *
  * Pure Column expressions by design (no UDF, no mapPartitions): the
  * split rides whole-stage codegen on the record scan, and every
  * regex is in the Java∩RE2 dialect (the [[graft.ops.TextAnalysis]]
  * convention) so an oracle can restate the same extraction.
  * Malformed payloads degrade to nulls (status null, body empty)
  * rather than throwing — a 100 TB crawl always contains garbage
  * responses, and the status filter drops them anyway.
  */
object HttpMessage {

  /** Header block (through the first blank line, exclusive). */
  def head(payload: Column): Column =
    substring_index(payload, "\r\n\r\n", 1)

  /** Body: everything after the first CRLF CRLF (empty if none). */
  def body(payload: Column): Column =
    when(payload.contains("\r\n\r\n"),
      substr(payload, length(head(payload)) + lit(5)))
      .otherwise(lit(""))

  /** Integer status code from the status line (null if unparsable). */
  def statusCode(payload: Column): Column = {
    val s = regexp_extract(head(payload), "^HTTP/[0-9.]+ (\\d{3})", 1)
    when(s === "", lit(null)).otherwise(s.cast("int"))
  }

  /** Content-Type value sans parameters (null if absent). */
  def contentType(payload: Column): Column = {
    val s = trim(regexp_extract(head(payload),
      "(?im)^content-type:[ \\t]*([^\\r\\n;]+)", 1))
    when(s === "", lit(null)).otherwise(s)
  }

  /** HTML → whitespace-normalized text: tags to spaces, runs of
    * whitespace collapsed, trimmed. The minimal tag strip every crawl
    * funnel runs before line/boilerplate filtering; both regexes are
    * Java∩RE2 so the oracle replays them verbatim. */
  def stripTags(html: Column): Column =
    trim(regexp_replace(
      regexp_replace(html, "<[^>]*>", " "), "\\s+", " "))

  private val BlockSplitRe =
    "(?i)</?(?:div|p|td|li|h[1-6]|article|section|nav|footer|header|" +
      "ul|ol|table|tr|blockquote)\\b[^>]*>"

  /** MAIN-CONTENT extraction by block text/link density — the
    * jusText / Boilerpipe family of algorithms (Pomikálek 2011;
    * Kohlschütter et al. 2010 — public), the step that separates
    * article text from nav/footer/sidebar chrome in every web-corpus
    * pipeline: split the page at block-level tag boundaries, score
    * each fragment by visible-text length and LINK DENSITY (the share
    * of its text living inside `<a>` — chrome is short and linky,
    * content is long and flat), keep the content-shaped blocks, and
    * re-join them in order.
    *
    * Deliberately PURE Column expressions over Java∩RE2 regexes and
    * integer per-mille thresholds — no UDF, no DOM: it rides
    * whole-stage codegen on the scan, and the ORACLE REPLAYS THE
    * ALGORITHM ITSELF (same split, same densities, same thresholds)
    * rather than just predicting outcomes (q180). The trade: no
    * nested-structure awareness, which the density signal is robust
    * to in practice and which keeps the operator a pure map at
    * 100 TB.
    *
    * @param minTextLen blocks with fewer visible chars drop
    * @param maxLinkDensityPermille blocks whose link-text share
    *        exceeds this (‰) drop
    */
  def mainContent(html: Column, minTextLen: Int = 25,
      maxLinkDensityPermille: Int = 300): Column = {
    val blocks = split(html, BlockSplitRe)
    val kept = filter(blocks, b => {
      val text = stripTags(b)
      val linkChars = aggregate(
        regexp_extract_all(b, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
        lit(0), (acc, x) => acc + length(stripTags(x)))
      length(text) >= minTextLen &&
        linkChars * 1000 <= length(text) * maxLinkDensityPermille
    })
    trim(regexp_replace(
      array_join(transform(kept, b => stripTags(b)), " "), "\\s+", " "))
  }

  /** Sitemap XML (sitemaps.org protocol, public — the crawl-discovery
    * complement of [[RobotsTxt]]): explode a sitemap document into its
    * `<url>` records with the four standard fields. Pure Java∩RE2
    * Column expressions (the [[mainContent]] contract — the oracle
    * replays the extraction itself); absent optional fields surface
    * as null, and the regex tolerates attribute-bearing tags and
    * whitespace. Feed the result's `loc` through [[RobotsTxt
    * .isAllowed]] and the frontier is born.
    *
    * @return array of structs (loc, lastmod, changefreq,
    *         priority_permille int — the protocol's 0.0–1.0 priority
    *         scaled to exact integer per-mille, 500 = the spec
    *         default when absent) */
  def sitemapUrls(xml: Column): Column = {
    val recs = regexp_extract_all(xml, lit("(?is)<url\\b[^>]*>(.*?)</url>"),
      lit(1))
    transform(recs, r => {
      def field(tag: String) = {
        val v = trim(regexp_extract(r,
          s"(?is)<$tag\\b[^>]*>(.*?)</$tag>", 1))
        when(v === "", lit(null)).otherwise(v)
      }
      struct(
        field("loc").as("loc"),
        field("lastmod").as("lastmod"),
        field("changefreq").as("changefreq"),
        coalesce(floor(field("priority").cast("double") * 1000)
          .cast("int"), lit(500)).as("priority_permille"))
    })
  }
}
