package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Deterministic fixture corpus for the [[HtmlDirectorySource]] gate
  * (q76): one recorded "listing page" per documents row with
  * `doc_id % 10 == 0`, written to `target/html_fixtures/<sf-name>/` —
  * a FIXED path (not [[graft.io.Scratch]]) because the driver's DuckDB
  * oracle re-reads the files via `read_text()` AFTER this JVM exits,
  * and the path is baked into the oracle SQL.
  *
  * Every byte derives from the row (lang, source) or a doc_id formula
  * (the price), so the oracle can restate the whole page from the
  * documents table + filename alone. The write is driver-side by
  * design: a fixture directory must land on ONE filesystem, and the
  * selected subset is bounded (1/10 of documents — 50 files at the
  * oracle's sf0.01). Idempotent: stale `*.html` in the target dir are
  * removed first, so re-runs at different sf never leave orphans.
  */
object HtmlFixtures {

  /** Price formula embedded in each page — restated in q76's oracle. */
  def priceOf(docId: Long): Long = (docId * 37) % 90000 + 10000

  private val written =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Memoized per (sfDir) for the JVM (the [[WarcFixtures]] r7
    * pattern, applied r14): the fixture is deterministic, and the
    * delete-and-rewrite of every file ran on EVERY bench invocation —
    * twice-warm + timed = three collect+encode passes per query rep,
    * pure harness build_sec. A fresh JVM still rewrites from scratch
    * (no cross-run state), and the fixed `target/...` path the oracle
    * globs is unchanged. */
  def write(spark: SparkSession, sfDir: String): String =
    written.computeIfAbsent(sfDir, _ => writeOnce(spark, sfDir))

  private def writeOnce(spark: SparkSession, sfDir: String): String = {
    val sfName = new java.io.File(sfDir).getName
    val dir = java.nio.file.Paths.get("target", "html_fixtures", sfName)
      .toAbsolutePath
    java.nio.file.Files.createDirectories(dir)
    val stale = dir.toFile.listFiles()
    if (stale != null)
      stale.filter(_.getName.endsWith(".html")).foreach(_.delete())
    val rows = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("lang"), col("source"))
      .collect()
      .sortBy(_.getLong(0))
    // deterministic LINK STRUCTURE for the web-graph gate (q134): the
    // page at sorted position j links to positions (j+1), (2j+1),
    // (7j+3) mod n — restated by the oracle from filenames alone, while
    // the Spark side must extract the hrefs from the real HTML.
    // Duplicate targets and self-links (e.g. 2j+1 ≡ j at j = n−1) are
    // kept: they are ordinary multigraph edges.
    val ids = rows.map(_.getLong(0))
    val n = ids.length
    rows.zipWithIndex.foreach { case (r, j) =>
      val id = r.getLong(0)
      val links = Seq((j + 1) % n, (2 * j + 1) % n, (7 * j + 3) % n)
        .map(t => f"""<a href="doc_${ids(t)}%06d.html">more</a>""")
        .mkString("\n")
      val html =
        s"""<html><body>
           |<span data-mark="MainPrice">${priceOf(id)} ₽/мес.</span>
           |<div class="lang">${r.getString(1)}</div>
           |<div class="source">${r.getString(2)}</div>
           |$links
           |</body></html>""".stripMargin
      java.nio.file.Files.write(dir.resolve(f"doc_$id%06d.html"),
        html.getBytes(StandardCharsets.UTF_8))
    }
    dir.toString
  }
}
