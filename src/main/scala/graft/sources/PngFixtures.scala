package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Deterministic PNG fixture corpus for the real-image-decode gate
  * (q87): one solid-fill PNG per documents row with `doc_id % 10 == 0`,
  * written to `target/png_fixtures/<sf-name>/` — a FIXED path (not
  * [[graft.io.Scratch]]) because the driver's DuckDB oracle re-lists the
  * files via `glob()` AFTER this JVM exits, and the path is baked into
  * the oracle SQL (same contract as [[HtmlFixtures]]).
  *
  * Every pixel derives from doc_id formulas (below), so the oracle can
  * restate dimensions AND per-channel means from the filename alone —
  * if `javax.imageio` decoding (q87's subject) breaks, the formulas
  * stop matching. Solid fill is the deliberate choice: a PNG round-trip
  * is lossless, so each channel mean equals the fill value EXACTLY and
  * the hash compare needs no tolerance. Driver-side write by design
  * (one filesystem, bounded subset — 50 files at the oracle's sf0.01);
  * idempotent: stale `*.png` are removed first.
  */
object PngFixtures {

  /** Dimension/fill formulas — restated in q87's oracle SQL. */
  def widthOf(docId: Long): Int = (16 + docId % 48).toInt
  def heightOf(docId: Long): Int = (16 + (docId * 7) % 48).toInt
  def redOf(docId: Long): Int = (docId % 256).toInt
  def greenOf(docId: Long): Int = ((docId * 3) % 256).toInt
  def blueOf(docId: Long): Int = ((docId * 7) % 256).toInt

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
    val dir = java.nio.file.Paths.get("target", "png_fixtures", sfName)
      .toAbsolutePath
    java.nio.file.Files.createDirectories(dir)
    val stale = dir.toFile.listFiles()
    if (stale != null)
      stale.filter(_.getName.endsWith(".png")).foreach(_.delete())
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
    ids.foreach { id =>
      val (w, h) = (widthOf(id), heightOf(id))
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (redOf(id) << 16) | (greenOf(id) << 8) | blueOf(id)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val f = dir.resolve(f"img_$id%06d.png").toFile
      require(javax.imageio.ImageIO.write(img, "png", f),
        s"no PNG writer available for $f")
    }
    dir.toString
  }

  /** Perceptual-hash threshold formula — restated in q129's oracle SQL.
    * Capped at 62 so the expected aHash 2^th − 1 stays inside a signed
    * 64-bit integer in every engine (th = 63 would need bit 63). */
  def threshOf(docId: Long): Int = (1 + docId % 62).toInt

  /** Second fixture family for the image NEAR-DUP gate (q129): 8×8
    * two-tone PNGs where pixel (x, y) is white iff `x + 8·y <
    * threshOf(doc_id)` — a raster fill-level pattern. Two images'
    * aHashes then differ in exactly |Δthresh| bits (each hash is the
    * low-threshold run of ones: 2^th − 1), so the oracle can restate
    * every near-dup pair AND its Hamming distance from filenames
    * alone, while the Spark side must earn them through a REAL decode
    * (`javax.imageio`) and the integer-pooled aHash. 8×8 exactly so
    * the 8×8 pooling grid is the identity and the expected hash needs
    * no resampling model. Same fixed-path/driver-glob contract as
    * [[write]]. */
  private val writtenPatterned =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Memoized like [[write]] (same r7/r14 rationale). */
  def writePatterned(spark: SparkSession, sfDir: String): String =
    writtenPatterned.computeIfAbsent(sfDir, _ =>
      writePatternedOnce(spark, sfDir))

  private def writePatternedOnce(spark: SparkSession,
      sfDir: String): String = {
    val sfName = new java.io.File(sfDir).getName
    val dir = java.nio.file.Paths.get("target", "png_ahash", sfName)
      .toAbsolutePath
    java.nio.file.Files.createDirectories(dir)
    val stale = dir.toFile.listFiles()
    if (stale != null)
      stale.filter(_.getName.endsWith(".png")).foreach(_.delete())
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
    ids.foreach { id =>
      val th = threshOf(id)
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          img.setRGB(x, y, if (x + 8 * y < th) 0xffffff else 0x000000)
          x += 1
        }
        y += 1
      }
      val f = dir.resolve(f"pat_$id%06d.png").toFile
      require(javax.imageio.ImageIO.write(img, "png", f),
        s"no PNG writer available for $f")
    }
    dir.toString
  }
}
