package graft.enrich

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** A12 cookies side-input (base_async_processor.py:23-35 +
  * async_scraper.py:79-81): a JSON cookie file loaded driver-side when
  * configured, attached to every outgoing request. The reference's file
  * shape is a JSON array of `{name, value, ...}` objects (the browser
  * export format); missing or corrupt files degrade to no cookies with
  * a warning, never a failure — same contract here.
  *
  * The jar is a small driver-side constant; [[withCookies]] folds it
  * into each [[HttpRequest]]'s headers before the frame ships to
  * executors, so the side-input travels inside the task closure (the
  * Spark-native broadcast of a tiny value).
  */
object Cookies {

  /** Load `[{name, value}, ...]` → ordered jar; None when the path is
    * unset, disabled, unreadable, or malformed (reference: warn+None). */
  def load(path: Option[String], useCookies: Boolean): Option[Seq[(String, String)]] =
    path.filter(_ => useCookies).flatMap { p =>
      try {
        val root = new ObjectMapper().readTree(
          java.nio.file.Files.readString(java.nio.file.Paths.get(p)))
        if (!root.isArray) None
        else Some(root.elements().asScala.toSeq.flatMap { n =>
          (Option(n.get("name")), Option(n.get("value"))) match {
            case (Some(k), Some(v)) => Some(k.asText() -> v.asText())
            case _ => None
          }
        })
      } catch {
        case e: Exception =>
          System.err.println(s"[cookies] failed to load $p: ${e.getMessage}")
          None
      }
    }

  /** RFC 6265 request header value: `k=v; k2=v2` in jar order. */
  def headerValue(jar: Seq[(String, String)]): String =
    jar.map { case (k, v) => s"$k=$v" }.mkString("; ")

  /** Attach the jar to every request (no-op for an empty jar). */
  def withCookies(requests: org.apache.spark.sql.Dataset[HttpRequest],
      jar: Option[Seq[(String, String)]]): org.apache.spark.sql.Dataset[HttpRequest] =
    jar.filter(_.nonEmpty) match {
      case None => requests
      case Some(j) =>
        val header = headerValue(j)
        import requests.sparkSession.implicits._
        requests.map(r => r.copy(headers = r.headers + ("Cookie" -> header)))
    }
}
