package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record reader — the ingestion shape of a
  * CommonCrawl-scale web pipeline: a crawl ships as large .warc files
  * holding many records, and the FIRST distributed operation is
  * splitting files into records correctly. Framing is
  * `Content-Length`-driven by spec: headers end at the first blank
  * line, exactly `Content-Length` payload BYTES follow, then CRLF CRLF
  * — so a payload containing `WARC/1.0` or header-shaped lines (real
  * crawls contain both; q174's fixtures plant document text verbatim)
  * parses correctly where delimiter splitting would shear it.
  *
  * Scale shape: one record-emitting pass per FILE (`mapPartitions`
  * over the `binaryFile` scan — each task holds one file's bytes,
  * emits record rows; with CommonCrawl's ~1 GB segment convention
  * that is the natural task grain, the same one its own tooling
  * uses). Offsets are byte positions into the file — the (file,
  * offset) pair is the standard WARC record address, and re-reading
  * one record later is a ranged read, not a rescan. Malformed input
  * fails LOUDLY with file + offset (a truncated record in a 100 TB
  * crawl should name itself, not vanish).
  *
  * @return (file, record_offset, record_id, warc_type, target_uri,
  *         content_length, payload) — payload decoded as UTF-8
  */
object WarcReader {

  def records(files: DataFrame, pathCol: String = "path",
      contentCol: String = "content"): DataFrame = {
    val enc = Encoders.tuple(Encoders.STRING, Encoders.BINARY)
    val out = files.select(col(pathCol), col(contentCol))
      .as[(String, Array[Byte])](enc)
      .mapPartitions { it =>
        it.flatMap { case (path, bytes) => parseFile(path, bytes) }
      }(Encoders.product[WarcRecord])
    out.toDF("file", "record_offset", "record_id", "warc_type",
      "target_uri", "content_length", "payload")
  }

  private[sources] def parseFile(path: String,
      bytes: Array[Byte]): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var pos = 0
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$path @ byte $pos: $msg")
    private def skipSeparators(): Unit = {
      while (pos + 1 < bytes.length &&
        bytes(pos) == '\r' && bytes(pos + 1) == '\n') pos += 2
    }
    private def readLine(): String = {
      val start = pos
      while (pos + 1 < bytes.length &&
        !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      if (pos + 1 >= bytes.length) fail("unterminated header line")
      val s = new String(bytes, start, pos - start, "UTF-8")
      pos += 2
      s
    }
    def hasNext: Boolean = { skipSeparators(); pos < bytes.length }
    def next(): WarcRecord = {
      skipSeparators()
      val recordOffset = pos
      val version = readLine()
      if (!version.startsWith("WARC/")) fail(
        s"expected WARC version line, got '${version.take(40)}'")
      var id: String = null
      var wtype: String = null
      var uri: String = null
      var len: Long = -1
      var line = readLine()
      while (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i < 0) fail(s"malformed header '${line.take(40)}'")
        val (k, v) = (line.substring(0, i).trim, line.substring(i + 1).trim)
        k.toLowerCase(java.util.Locale.ROOT) match {
          case "warc-record-id" => id = v
          case "warc-type" => wtype = v
          case "warc-target-uri" => uri = v
          case "content-length" => len = v.toLong
          case _ => () // unknown headers are legal; carry nothing
        }
        line = readLine()
      }
      if (len < 0) fail("record without Content-Length")
      if (pos + len > bytes.length) fail(
        s"truncated payload: need $len bytes, ${bytes.length - pos} left")
      val payload = new String(bytes, pos, len.toInt, "UTF-8")
      pos += len.toInt
      WarcRecord(path, recordOffset.toLong, id, wtype, uri, len, payload)
    }
  }
}

/** Top-level for Janino-visible encoders (the Multimodal row rule). */
private[graft] case class WarcRecord(file: String, record_offset: Long,
    record_id: String, warc_type: String, target_uri: String,
    content_length: Long, payload: String)
