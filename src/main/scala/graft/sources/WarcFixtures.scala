package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Deterministic WARC fixture corpus for the CommonCrawl-shape
  * ingestion gate (q174): every documents row with `doc_id % 10 == 0`
  * becomes one WARC/1.0 response record; records pack into FOUR .warc
  * files by `doc_id % 4` (multiple records per file — the point is
  * record SPLITTING inside a file, the thing a naive line reader gets
  * wrong). Fixed-path / driver-glob contract of [[PngFixtures]].
  *
  * Records are spec-shaped (ISO 28500, public): version line, named
  * headers, `Content-Length`-driven payload framing, CRLF CRLF record
  * separator. The payload is the document's text VERBATIM — including
  * any text that could look like a header or a version line — so only
  * a Content-Length-driven parser (not delimiter splitting) reproduces
  * it; q174's oracle checks payload fidelity by md5 against the
  * documents table.
  */
object WarcFixtures {

  /** Target-URI formula — restated in q174's oracle SQL. */
  def uriOf(docId: Long): String =
    s"http://crawl.example/doc/$docId"

  private val written =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Memoized per (sfDir) for the JVM: the fixture is deterministic,
    * and re-collecting the documents table on every bench invocation
    * of q174/q177 was pure harness build_sec (r7 brief item 3). */
  def write(spark: SparkSession, sfDir: String): String =
    written.computeIfAbsent(sfDir, _ => writeOnce(spark, sfDir))

  private def writeOnce(spark: SparkSession, sfDir: String): String = {
    val sfName = new java.io.File(sfDir).getName
    val dir = java.nio.file.Paths.get("target", "warc", sfName)
      .toAbsolutePath
    java.nio.file.Files.createDirectories(dir)
    val stale = dir.toFile.listFiles()
    if (stale != null)
      stale.filter(_.getName.endsWith(".warc")).foreach(_.delete())
    val rows = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), coalesce(col("text"), lit("")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    (0 until 4).foreach { part =>
      val sb = new java.lang.StringBuilder()
      rows.filter(_._1 % 4 == part).foreach { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        sb.append("WARC/1.0\r\n")
          .append("WARC-Type: response\r\n")
          .append(s"WARC-Record-ID: <urn:graft:$id>\r\n")
          .append(s"WARC-Target-URI: ${uriOf(id)}\r\n")
          .append(s"Content-Length: ${payload.length}\r\n")
          .append("\r\n")
          .append(text)
          .append("\r\n\r\n")
      }
      java.nio.file.Files.write(dir.resolve(f"crawl_$part%02d.warc"),
        sb.toString.getBytes("UTF-8"))
    }
    dir.toString
  }

  /** Second fixture family for the crawl-to-text funnel (q175):
    * records whose payloads are full HTTP RESPONSE MESSAGES — status
    * line + headers + CRLF CRLF + an HTML body wrapping the document
    * text in shared site chrome. Every 3rd doc (doc_id % 30 == 0,
    * within the % 10 == 0 record set) is a 404 with a non-HTML body —
    * the funnel's status filter must drop it. Restated formulas:
    * status = 404 iff doc_id % 30 = 0 else 200; 200-body =
    * `<html><body><nav>SITE NAV</nav><p>` text `</p><footer>(c) 2026
    * crawl chrome</footer></body></html>`. Same fixed-path contract;
    * written to `target/warc_http/<sf-name>/`. */
  private val writtenHttp =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Memoized like [[write]] (same rationale). */
  def writeHttp(spark: SparkSession, sfDir: String): String =
    writtenHttp.computeIfAbsent(sfDir, _ => writeHttpOnce(spark, sfDir))

  private def writeHttpOnce(spark: SparkSession, sfDir: String): String = {
    val sfName = new java.io.File(sfDir).getName
    val dir = java.nio.file.Paths.get("target", "warc_http", sfName)
      .toAbsolutePath
    java.nio.file.Files.createDirectories(dir)
    val stale = dir.toFile.listFiles()
    if (stale != null)
      stale.filter(_.getName.endsWith(".warc")).foreach(_.delete())
    val rows = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), coalesce(col("text"), lit("")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    (0 until 4).foreach { part =>
      val sb = new java.lang.StringBuilder()
      rows.filter(_._1 % 4 == part).foreach { case (id, text) =>
        val msg = if (id % 30 == 0)
          "HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\n" +
            "not found"
        else
          "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8" +
            "\r\n\r\n<html><body><nav>SITE NAV</nav><p>" + text +
            "</p><footer>(c) 2026 crawl chrome</footer></body></html>"
        val payload = msg.getBytes("UTF-8")
        sb.append("WARC/1.0\r\n")
          .append("WARC-Type: response\r\n")
          .append(s"WARC-Record-ID: <urn:graft:$id>\r\n")
          .append(s"WARC-Target-URI: ${uriOf(id)}\r\n")
          .append(s"Content-Length: ${payload.length}\r\n")
          .append("\r\n")
          .append(msg)
          .append("\r\n\r\n")
      }
      java.nio.file.Files.write(dir.resolve(f"crawl_$part%02d.warc"),
        sb.toString.getBytes("UTF-8"))
    }
    dir.toString
  }
}
