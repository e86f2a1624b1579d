package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** robots.txt (RFC 9309, the Robots Exclusion Protocol — public spec)
  * — the crawl-politeness gate every 100 TB web pipeline runs before
  * fetching: parse each host's robots.txt into a RULES TABLE, then
  * join candidate URLs against it with the RFC's group-selection and
  * longest-match semantics. Both halves are data-parallel: parsing is
  * a per-(host, file) map (robots files are KB-sized), and the
  * verdict join shuffles on the host key — rules for a host are
  * dozens of rows, so the per-URL candidate set is tiny and the
  * argmax is a map-side-combined struct max, never a window.
  *
  * Spec semantics implemented:
  *  - groups = consecutive `User-agent:` lines followed by rules; a
  *    `User-agent:` after rules starts a NEW group (RFC 9309 §2.2.1)
  *  - comments (`#` to EOL) stripped, keys case-insensitive, values
  *    trimmed; empty-pattern rules ignored
  *  - group selection: the matching specific-agent group if one
  *    exists, else the `*` group, else no rules → allowed
  *  - precedence: longest matched pattern wins; at equal length
  *    ALLOW wins (§2.2.2)
  *  - `*` (any octets) and `$` (end anchor) wildcards supported in
  *    patterns — compiled ONCE per rule at parse time into an
  *    anchored Java regex carried on the rule row
  */
object RobotsTxt {

  /** Compile an RFC 9309 path pattern to an anchored Java regex:
    * literals quoted, `*` → `.*`, trailing `$` → end anchor. */
  private[sources] def patternRegex(pattern: String): String = {
    val (body, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    val quoted = body.split("\\*", -1)
      .map(java.util.regex.Pattern.quote)
      .mkString(".*")
    "^" + quoted + (if (anchored) "$" else "")
  }

  /** Parse (host, robots.txt content) rows into the rules table.
    * @return (host, agent lowercase, rule 'allow'|'disallow',
    *         pattern, rule_len, rx) */
  def parseRules(df: DataFrame, hostCol: String,
      contentCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    val out = df.select(col(hostCol).cast("string"),
        coalesce(col(contentCol), lit("")))
      .as[(String, String)](enc)
      .mapPartitions { it =>
        it.flatMap { case (host, content) => parseOne(host, content) }
      }(Encoders.product[RobotsRule])
    out.toDF("host", "agent", "rule", "pattern", "rule_len", "rx")
  }

  private[sources] def parseOne(host: String,
      content: String): Seq[RobotsRule] = {
    val rules = scala.collection.mutable.ArrayBuffer.empty[RobotsRule]
    var agents = List.empty[String]
    var inRules = false
    content.split("\r?\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            val a = value.toLowerCase(java.util.Locale.ROOT)
            if (inRules) { agents = List(a); inRules = false }
            else agents = a :: agents
          case "allow" | "disallow" if value.nonEmpty =>
            inRules = true
            agents.foreach { a =>
              rules += RobotsRule(host, a, key, value,
                value.length.toLong, patternRegex(value))
            }
          case _ => () // crawl-delay, sitemap, unknown: group-neutral
        }
      }
    }
    rules.toSeq
  }

  /** Verdict per URL for one crawler agent. Group selection happens
    * per HOST (specific group if present, else `*`); precedence is
    * one struct-max aggregation over (rule_len, is_allow) — allow
    * wins ties by sorting above disallow at equal length. URLs on
    * hosts with no rules (or no matching rule) are allowed.
    *
    * @param urls  (idCol, hostCol, pathCol)
    * @param rules [[parseRules]] output
    * @return (idCol, hostCol, pathCol, allowed, winning_rule_len —
    *         0 when no rule matched) */
  def isAllowed(urls: DataFrame, idCol: String, hostCol: String,
      pathCol: String, rules: DataFrame, agent: String): DataFrame = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    // per host: does a specific group for this agent exist?
    val hostsWithSpecific = rules.filter(col("agent") === a)
      .select(col("host")).distinct()
      .withColumn("__spec", lit(true))
    val selected = rules
      .filter(col("agent") === a || col("agent") === "*")
      .join(hostsWithSpecific, Seq("host"), "left")
      .filter(when(coalesce(col("__spec"), lit(false)),
        col("agent") === a).otherwise(col("agent") === "*"))
      .select(col("host"), col("rule"), col("rule_len"), col("rx"))
    val candidates = urls
      .select(col(idCol), col(hostCol).as("host"), col(pathCol))
      .join(selected, Seq("host"), "left")
      .withColumn("__match",
        col("rx").isNotNull && rlike(col(pathCol), col("rx")))
    candidates
      .groupBy(col(idCol), col("host"), col(pathCol))
      .agg(max(when(col("__match"), struct(col("rule_len").as("l"),
        (col("rule") === "allow").as("a")))).as("__w"))
      .select(col(idCol), col("host").as(hostCol), col(pathCol),
        coalesce(col("__w.a"), lit(true)).as("allowed"),
        coalesce(col("__w.l"), lit(0L)).as("winning_rule_len"))
  }
}

/** Top-level for Janino-visible encoders (the Multimodal row rule). */
private[graft] case class RobotsRule(host: String, agent: String,
    rule: String, pattern: String, rule_len: Long, rx: String)
