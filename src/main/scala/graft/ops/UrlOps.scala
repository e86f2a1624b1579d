package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Lowercased host with any `:port` stripped (no default-port
    * special-casing — blocklists key on the name, not the port). */
  def hostOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?]+)", 1)),
      ":[0-9]+$", "")

  /** All label-boundary suffixes of a host: `a.b.c` → [a.b.c, b.c, c] —
    * the expansion that turns "domain or any parent domain" matching
    * into plain equality joins. Bounded by the label count (~10). */
  def domainSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + 1), "."))
  }

  /** Domain-blocklist tagging — the UT1/RefinedWeb-style URL filter: a
    * row is blocked when its host IS a blocklist domain or any
    * subdomain of one. Suffix matching is an equality JOIN on the
    * exploded label-suffix chain (never a regex scan over the
    * blocklist): at 100 TB the blocklist is millions of rows — a
    * shuffle join on 8-byte-ish suffix keys that AQE broadcasts when
    * the list is small. The most specific (longest) matching entry is
    * reported; ties cannot occur (two same-length suffixes of one host
    * are identical).
    *
    * @return df columns + (host, blocked_domain nullable, blocked)
    */
  def flagBlocked(df: DataFrame, idCol: String, urlCol: String,
      blocklist: DataFrame, domainCol: String = "domain"): DataFrame = {
    val bl = blocklist.select(lower(trim(col(domainCol))).as("__d"))
      .distinct()
    val withHost = df.withColumn("host", hostOf(col(urlCol)))
    val hits = withHost
      .select(col(idCol), explode(domainSuffixes(col("host"))).as("__d"))
      .join(bl, "__d")
      .groupBy(col(idCol))
      .agg(max(struct(length(col("__d")).as("__len"), col("__d").as("__dom")))
        .as("__m"))
      .select(col(idCol), col("__m.__dom").as("blocked_domain"))
    withHost.join(hits, Seq(idCol), "left")
      .withColumn("blocked", col("blocked_domain").isNotNull)
  }

  /** The filtered corpus: rows whose host matches no blocklist entry. */
  def blocklistFilter(df: DataFrame, idCol: String, urlCol: String,
      blocklist: DataFrame, domainCol: String = "domain"): DataFrame =
    flagBlocked(df, idCol, urlCol, blocklist, domainCol)
      .filter(!col("blocked"))
      .drop("host", "blocked_domain", "blocked")

  /** POLITENESS FETCH SCHEDULE — the frontier-planning step between
    * [[graft.sources.RobotsTxt]]'s verdicts and the worker-pool
    * fetcher (`enrich/Enrichment`): every crawler owes each host
    * serialized, delay-spaced requests (the per-host politeness
    * contract robots.txt's crawl-delay expresses), and a distributed
    * frontier must guarantee it WITHOUT coordination. Two
    * deterministic rules do it:
    *
    *  - `worker = md5-60(host) mod workers` — ALL of a host's URLs
    *    land on one worker (the invariant that makes per-host
    *    serialization local, no locks), engine- and
    *    cluster-size-independent by the same hash math as
    *    [[graft.ops.Sampling]]'s splits;
    *  - `fetch_offset_ms = seq_in_host · perHostDelayMs`, with
    *    `seq_in_host` the (idCol asc) rank WITHIN the host — a
    *    per-host window, which is the scale-correct shape here:
    *    hosts are many and a batch's per-host URL count is bounded,
    *    so no group funnels the corpus through one task.
    *
    * @return (idCol, hostCol, worker, seq_in_host, fetch_offset_ms) */
  def politenessSchedule(df: DataFrame, idCol: String, hostCol: String,
      workers: Int, perHostDelayMs: Long): DataFrame = {
    require(workers >= 1, s"workers must be >= 1, got $workers")
    require(perHostDelayMs >= 0,
      s"perHostDelayMs must be >= 0, got $perHostDelayMs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(hostCol)).orderBy(col(idCol).asc)
    df.select(col(idCol), col(hostCol))
      .withColumn("worker",
        pmod(graft.ops.Dedup.md5Hash60(col(hostCol)), lit(workers.toLong))
          .cast("int"))
      .withColumn("seq_in_host",
        (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_offset_ms",
        col("seq_in_host") * perHostDelayMs)
  }
}
