package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WarcReaderSpec extends SparkSpec {
  import spark.implicits._

  private def rec(id: Long, body: String): String =
    s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:graft:$id>\r\n" +
      s"WARC-Target-URI: http://x/$id\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n" +
      body + "\r\n\r\n"

  test("parseFile: Content-Length framing survives payloads that LOOK " +
      "like records; multi-record files split at exact offsets") {
    // the adversarial payload: a fake version line + fake headers
    val trap = "WARC/1.0\r\nWARC-Type: fake\r\nContent-Length: 9999\r\n\r\nnope"
    val bytes = (rec(1, "hello") + rec(2, trap) + rec(3, "")).getBytes("UTF-8")
    val out = WarcReader.parseFile("f.warc", bytes).toSeq
    assert(out.map(_.record_id) ==
      Seq("<urn:graft:1>", "<urn:graft:2>", "<urn:graft:3>"))
    assert(out(1).payload == trap) // verbatim, not sheared
    assert(out(2).payload == "" && out(2).content_length == 0)
    assert(out.head.record_offset == 0L)
    assert(out(1).record_offset ==
      rec(1, "hello").getBytes("UTF-8").length.toLong)
  }

  test("parseFile: loud with file+offset on truncation, bad version, " +
      "and missing Content-Length") {
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException] {
        WarcReader.parseFile("bad.warc", b).toList
      }.getMessage
    assert(msg(rec(1, "hello").getBytes("UTF-8").dropRight(9))
      .contains("bad.warc"))
    assert(msg("HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8"))
      .contains("version"))
    assert(msg("WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes("UTF-8"))
      .contains("Content-Length"))
  }

  test("fixture round-trip: the q174 Spark side reproduces every " +
      "payload byte-for-byte from real multi-record files") {
    val dir = WarcFixtures.write(spark, "/root/testdata/sf0.001")
    val files = spark.read.format("binaryFile").load(s"$dir/*.warc")
    val out = WarcReader.records(files)
      .select(regexp_extract($"record_id", "urn:graft:(\\d+)", 1)
        .cast("long").as("doc_id"), $"payload", $"warc_type")
      .as[(Long, String, String)].collect()
    assert(out.nonEmpty && out.forall(_._3 == "response"))
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", coalesce($"text", lit("")))
      .as[(Long, String)].collect().toMap
    assert(out.map(_._1).sorted.toSeq == docs.keys.toSeq.sorted)
    out.foreach { case (id, payload, _) => assert(payload == docs(id)) }
  }

  test("sitemapUrls: records parsed through attribute noise and " +
      "whitespace; optional fields null; default priority 500") {
    val xml = """<?xml version="1.0"?><urlset xmlns="x">
      |<url data-x="1"> <loc> http://h/a </loc>
      |  <lastmod>2026-02-11</lastmod><priority>0.75</priority>
      |  <changefreq>daily</changefreq></url>
      |<url><loc>http://h/b</loc></url></urlset>""".stripMargin
    val out = Seq(Tuple1(xml)).toDF("xml")
      .select(explode(HttpMessage.sitemapUrls($"xml")).as("u"))
      .select("u.loc", "u.lastmod", "u.changefreq", "u.priority_permille")
      .as[(String, Option[String], Option[String], Int)].collect().toSeq
    assert(out == Seq(
      ("http://h/a", Some("2026-02-11"), Some("daily"), 750),
      ("http://h/b", None, None, 500)))
  }

  test("politenessSchedule: one worker per host, serialized " +
      "delay-spaced offsets, dense per-host sequence") {
    val urls = (0L until 60L).map(i => (i, s"h${i % 7}.com"))
      .toDF("id", "host")
    val out = graft.ops.UrlOps.politenessSchedule(urls, "id", "host",
        workers = 4, perHostDelayMs = 1000L)
      .as[(Long, String, Int, Long, Long)].collect()
    out.groupBy(_._2).values.foreach { host =>
      assert(host.map(_._3).distinct.length == 1)      // one worker
      assert(host.map(_._4).sorted.toSeq ==
        (0L until host.length.toLong))                  // dense seq
      assert(host.forall(r => r._5 == r._4 * 1000L))    // spaced slots
    }
    assert(out.map(_._3).forall(w => w >= 0 && w < 4))
  }

  test("mainContent: long flat blocks survive; linky nav, linky " +
      "footer, and short notes drop; empty page yields empty text") {
    val page = "<div><a href=\"/\">Home</a> <a href=\"/x\">About Us " +
      "Team</a> <a>Contact and Support Desk</a></div>" +
      "<p>This paragraph is the actual article content of the page " +
      "and it is pleasantly long.</p>" +
      "<p>short note</p>" +
      "<p>This second content block mentions a <a href=\"/ref\">single " +
      "reference</a> inside a long passage so its link density stays " +
      "low and it must survive the cut.</p>" +
      "<footer><a>Terms</a> (c) site</footer>"
    val out = Seq((1L, page), (2L, "")).toDF("id", "html")
      .select($"id", HttpMessage.mainContent($"html").as("t"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "This paragraph is the actual article content " +
      "of the page and it is pleasantly long. This second content " +
      "block mentions a single reference inside a long passage so " +
      "its link density stays low and it must survive the cut.")
    assert(out(2L) == "")
  }

  test("RobotsTxt.parseOne: groups, comments, case-insensitive keys, " +
      "stacked user-agents, empty-value rules ignored, wildcards") {
    val txt = """# top comment
                |User-Agent: GraftBot
                |User-agent: other
                |Disallow: /a/   # inline comment
                |Allow: /a/b*
                |Disallow:
                |
                |User-agent: *
                |Disallow: /c$
                |""".stripMargin
    val rules = RobotsTxt.parseOne("h", txt)
    // both stacked agents get both non-empty rules; * gets the anchor
    assert(rules.map(r => (r.agent, r.rule, r.pattern)).toSet == Set(
      ("graftbot", "disallow", "/a/"), ("graftbot", "allow", "/a/b*"),
      ("other", "disallow", "/a/"), ("other", "allow", "/a/b*"),
      ("*", "disallow", "/c$")))
    assert("/a/bxyz".matches(
      rules.find(r => r.agent == "graftbot" && r.rule == "allow").get.rx))
    val anchor = rules.find(_.agent == "*").get.rx
    assert("/c".matches(anchor) && !"/cc".matches(anchor))
  }

  test("RobotsTxt.isAllowed: specific group shadows *, longest match " +
      "wins, allow wins ties, ruleless hosts allowed") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /x/\nAllow: /x/ok/\n" +
        "User-agent: bot\nDisallow: /\n"),
      ("b.com", "User-agent: *\nAllow: /p\nDisallow: /p\n"),
    ).toDF("host", "robots")
    val rules = RobotsTxt.parseRules(robots, "host", "robots")
    val urls = Seq(
      (1L, "a.com", "/x/ok/page"), (2L, "a.com", "/x/secret"),
      (3L, "a.com", "/open"), (4L, "b.com", "/page"),
      (5L, "c.com", "/anything"),
    ).toDF("id", "host", "path")
    def run(agent: String) = RobotsTxt.isAllowed(urls, "id", "host",
        "path", rules, agent)
      .as[(Long, String, String, Boolean, Long)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    val star = run("someone")
    assert(star(1L) == ((true, 6L)))  // /x/ok/ allow beats /x/ disallow
    assert(star(2L) == ((false, 3L)))
    assert(star(3L) == ((true, 0L)))  // no matching rule
    assert(star(4L) == ((true, 2L)))  // equal length: allow wins
    assert(star(5L) == ((true, 0L)))  // host without robots
    val bot = run("BOT") // case-insensitive agent match
    assert(bot(1L) == ((false, 1L)) && bot(2L) == ((false, 1L)))
    assert(bot(4L) == ((true, 2L)))   // b.com has no bot group -> *
  }

  test("HttpMessage: status/content-type/body split and tag strip; " +
      "malformed payloads degrade to null status, not a throw") {
    val ok = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8" +
      "\r\nX-Junk: y\r\n\r\n<p>Hello <b>world</b></p>"
    val nf = "HTTP/1.1 404 Not Found\r\n\r\nnope"
    val garbage = "not an http message at all"
    val df = Seq((1L, ok), (2L, nf), (3L, garbage)).toDF("id", "p")
      .select($"id", HttpMessage.statusCode($"p").as("st"),
        HttpMessage.contentType($"p").as("ct"),
        HttpMessage.stripTags(HttpMessage.body($"p")).as("txt"))
    val got = df.as[(Long, Option[Int], Option[String], String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((Some(200), Some("text/html"), "Hello world")))
    assert(got(2L) == ((Some(404), None, "nope")))
    assert(got(3L) == ((None, None, "")))
  }
}
