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
}
