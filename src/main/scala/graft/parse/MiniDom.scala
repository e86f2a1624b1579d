package graft.parse

import scala.collection.mutable.ArrayBuffer

/** Minimal HTML element extraction for the parser UDF (SURVEY §2 U1-U6).
  *
  * The container ships no HTML parser library (zero-egress, fixed jar
  * set), so this implements the small slice the listing parser needs:
  * locate elements by attribute match and return their balanced inner
  * HTML (open/close counting on the element's own tag name), plus tag
  * stripping for text extraction. Fixtures are well-formed HTML; this is
  * NOT a general-purpose parser (comments/CDATA/script-with-markup are
  * out of scope, like the reference's selector set).
  */
object MiniDom {

  private val openTagRe = """<([a-zA-Z][a-zA-Z0-9]*)\b[^>]*>""".r

  /** All elements whose opening tag contains `attr="value"`; returns
    * (fullOpeningTag, innerHtml) in document order. */
  def findAll(html: String, attr: String, value: String): Seq[(String, String)] = {
    val needle = s"""$attr="$value""""
    val out = ArrayBuffer.empty[(String, String)]
    var from = 0
    while (from < html.length) {
      val at = html.indexOf(needle, from)
      if (at < 0) { from = html.length }
      else {
        val tagStart = html.lastIndexOf('<', at)
        if (tagStart < 0) { from = at + needle.length }
        else {
          val tagEnd = html.indexOf('>', at)
          val openTag = html.substring(tagStart, tagEnd + 1)
          openTagRe.findPrefixMatchOf(openTag) match {
            case Some(m) =>
              val tag = m.group(1)
              if (openTag.endsWith("/>")) {
                out += ((openTag, ""))
                from = tagEnd + 1
              } else {
                val inner = balancedInner(html, tagEnd + 1, tag)
                out += ((openTag, inner))
                from = tagEnd + 1
              }
            case None => from = at + needle.length
          }
        }
      }
    }
    out.toSeq
  }

  /** Inner HTML from `start` to the matching `</tag>` (depth counting). */
  private def balancedInner(html: String, start: Int, tag: String): String = {
    val open = s"<$tag"
    val close = s"</$tag"
    var depth = 1
    var i = start
    while (i < html.length && depth > 0) {
      val no = html.indexOf(open, i)
      val nc = html.indexOf(close, i)
      if (nc < 0) return html.substring(start)
      if (no >= 0 && no < nc) {
        // an opening tag — but only count it if it's a real tag boundary
        val after = html.charAt(no + open.length)
        if (after == ' ' || after == '>' || after == '/' || after == '\t')
          depth += 1
        i = no + open.length
      } else {
        depth -= 1
        if (depth == 0) return html.substring(start, nc)
        i = nc + close.length
      }
    }
    html.substring(start)
  }

  def findFirst(html: String, attr: String, value: String): Option[(String, String)] =
    findAll(html, attr, value).headOption

  def exists(html: String, attr: String, value: String): Boolean =
    html.contains(s"""$attr="$value"""")

  /** Visible text: tags stripped, entities for the chars fixtures use,
    * whitespace collapsed (≈ BeautifulSoup get_text + strip). */
  def text(innerHtml: String): String =
    innerHtml.replaceAll("<[^>]*>", " ")
      .replace("&nbsp;", " ").replace("&amp;", "&")
      .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replaceAll("[ \t\r\n]+", " ").trim

  /** Elements whose `class` attribute CONTAINS the token (CSS
    * `.token` semantics — querySelector in the reference's JS), unlike
    * [[findAll]]'s exact attr="value" match. */
  def findAllByClassToken(html: String, token: String): Seq[(String, String)] = {
    val out = ArrayBuffer.empty[(String, String)]
    var from = 0
    while (from < html.length) {
      val at = html.indexOf("class=\"", from)
      if (at < 0) { from = html.length }
      else {
        val vEnd = html.indexOf('"', at + 7)
        val classes =
          if (vEnd < 0) Array.empty[String]
          else html.substring(at + 7, vEnd).split("\\s+")
        if (classes.contains(token)) {
          val tagStart = html.lastIndexOf('<', at)
          val tagEnd = html.indexOf('>', at)
          if (tagStart >= 0 && tagEnd > tagStart) {
            val openTag = html.substring(tagStart, tagEnd + 1)
            openTagRe.findPrefixMatchOf(openTag).foreach { m =>
              if (openTag.endsWith("/>")) out += ((openTag, ""))
              else out += ((openTag, balancedInner(html, tagEnd + 1, m.group(1))))
            }
          }
        }
        from = at + 7
      }
    }
    out.toSeq
  }

  /** Raw text nodes (inter-tag runs), entity-decoded and ws-collapsed —
    * the textContent of LEAF elements is a concatenation of these, so a
    * pattern that must match inside one leaf (extract_summary.js:44-56's
    * `element.children.length === 0` walk) can be searched per run. */
  def textRuns(html: String): Seq[String] =
    html.split("<[^>]*>").toSeq.map(text).filter(_.nonEmpty)

  /** Attribute value from an opening tag. */
  def attr(openTag: String, name: String): Option[String] = {
    val re = (name + "=\"([^\"]*)\"").r
    re.findFirstMatchIn(openTag).map(_.group(1))
  }

  /** All inner-HTML of `<tagName …>…</tagName>` children inside html. */
  def childrenByTag(html: String, tagName: String): Seq[String] = {
    val re = (s"(?s)<$tagName\\b[^>]*>(.*?)</$tagName>").r
    re.findAllMatchIn(html).map(_.group(1)).toSeq
  }
}
