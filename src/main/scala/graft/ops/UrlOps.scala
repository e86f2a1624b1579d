package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass a web-corpus pipeline
  * runs before URL-keyed dedup/blocklists (the same normalization
  * family the reference applies when it compiles and compares listing
  * URLs, `construct_url.py`, `html_parser.py:240-244`): distinct
  * surface forms of one resource must collapse to one key or URL-level
  * dedup silently under-counts.
  *
  * Canonical form: lowercase scheme and host; default port stripped
  * (`:80` for http, `:443` for https); fragment dropped; tracking
  * params (`utm_*`, `fbclid`, `gclid`) dropped; remaining query params
  * sorted bytewise; trailing path slashes trimmed (root stays `/`, an
  * empty path becomes `/`).
  *
  * Pure Column expressions (codegen'd map, no UDF); the regex dialect
  * is restricted to the Java ∩ RE2 subset (the q61 discipline) so the
  * DuckDB oracle replays the identical transform.
  */
object UrlOps {

  private val TrackingParam = "^(utm_[a-z0-9]+|fbclid|gclid)="

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val hostPort = lower(regexp_extract(rest, "^([^/?]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathQ = regexp_replace(rest, "^[^/?]+", "")
    val rawPath = regexp_extract(pathQ, "^([^?]*)", 1)
    val trimmed = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val query = regexp_extract(pathQ, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    val sortedQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
  }
}
