package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec

class HtmlDirectorySourceSpec extends SparkSpec {
  import spark.implicits._

  private def mkFixtures(): String = {
    val dir = Files.createTempDirectory("graft_htmlsrc_")
    Seq(
      "page_a.html" -> "<html><body>alpha</body></html>",
      "page_b.html" -> "<html><body>beta page</body></html>",
      "page_c.html" -> "<html><body>gamma</body></html>",
      "notes.txt" -> "not html, must be ignored",
    ).foreach { case (name, content) =>
      Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    }
    dir.toAbsolutePath.toString
  }

  private def read(dir: String) =
    spark.read.format("graft-html").load(dir)

  test("reads a directory of html pages with exact metadata and content") {
    val dir = mkFixtures()
    val rows = read(dir)
      .select($"name", $"length", $"html")
      .as[(String, Long, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("page_a.html", "page_b.html", "page_c.html"))
    val a = rows.head
    assert(a._3 == "<html><body>alpha</body></html>")
    assert(a._2 == a._3.getBytes(StandardCharsets.UTF_8).length)
    // path is the absolute filesystem path (the read_text() contract)
    val paths = read(dir).select($"path").as[String].collect()
    assert(paths.forall(p => p.startsWith(dir) && p.endsWith(".html")))
  }

  test("metadata filters push into the scan and prune files before any read") {
    val dir = mkFixtures()
    HtmlDirectorySource.bytesReadForTest.reset()
    val q = read(dir).filter($"name" === "page_b.html").select($"name", $"html")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("page_b.html"))
    val out = q.as[(String, String)].collect()
    assert(out.toSeq == Seq(("page_b.html", "<html><body>beta page</body></html>")))
    // only page_b's bytes were ever read — the other files were pruned
    // at planning, not post-filtered
    assert(HtmlDirectorySource.bytesReadForTest.sum() ==
      "<html><body>beta page</body></html>".getBytes(StandardCharsets.UTF_8).length)
  }

  test("content predicates stay residual and still evaluate correctly") {
    val dir = mkFixtures()
    val out = read(dir).filter($"html".contains("beta"))
      .select($"name").as[String].collect()
    assert(out.toSeq == Seq("page_b.html"))
  }

  test("column pruning: a metadata-only projection opens no files") {
    val dir = mkFixtures()
    HtmlDirectorySource.bytesReadForTest.reset()
    val out = read(dir).select($"name", $"length")
      .as[(String, Long)].collect()
    assert(out.length == 3)
    assert(HtmlDirectorySource.bytesReadForTest.sum() == 0L)
    // count() reads nothing either
    HtmlDirectorySource.bytesReadForTest.reset()
    assert(read(dir).count() == 3L)
    assert(HtmlDirectorySource.bytesReadForTest.sum() == 0L)
  }

  test("length comparisons prune at planning too") {
    val dir = mkFixtures()
    val out = read(dir).filter($"length" > lengthOf("<html><body>alpha</body></html>"))
      .select($"name").as[String].collect()
    assert(out.toSeq == Seq("page_b.html"))
  }

  private def lengthOf(s: String): Long =
    s.getBytes(StandardCharsets.UTF_8).length.toLong

  test("missing directory reads as empty, matching the A1 contract") {
    val out = read("/nonexistent/graft-html-dir")
    assert(out.count() == 0L)
  }

  test("fixture writer emits the oracle-restatable corpus") {
    val dir = HtmlFixtures.write(spark, "/root/testdata/sf0.001")
    val pages = read(dir).select($"name", $"html").as[(String, String)].collect()
    assert(pages.nonEmpty)
    assert(pages.forall { case (n, h) =>
      n.matches("doc_\\d{6}\\.html") && h.contains("MainPrice") })
    // idempotent: rewriting leaves the same file set
    val again = HtmlFixtures.write(spark, "/root/testdata/sf0.001")
    val names2 = read(again).select($"name").as[String].collect().sorted
    assert(names2.toSeq == pages.map(_._1).sorted.toSeq)
  }
}
