package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Deterministic "video" fixture corpus for the frame-sampling gate
  * (q170): one GVID container per documents row with `doc_id % 10 ==
  * 0`, written to `target/gvid/<sf-name>/` — the fixed-path /
  * driver-glob contract of [[PngFixtures]].
  *
  * GVID is this repo's codec-seam container (real video codecs are
  * env-bound in this container, exactly like Playwright rendering —
  * the Spark-side plumbing is the subject): magic `GVID`, then
  * big-endian int32 width, height, frame count, then `n` raw 8-bit
  * grayscale frames of `w·h` bytes each. The layout is real binary
  * parsing — offsets, bounds, per-frame extraction — everything a real
  * demuxer seam needs except the entropy coding.
  *
  * Every frame is the q129 fill-level pattern keyed by
  * [[sceneOf]](id, frame): cell `c` of the 8×8 pooling grid is bright
  * (200) iff `c < scene`, else dark (50), painted as 2×2 pixel blocks
  * of the 16×16 frame — so the integer-pooled frame aHash is EXACTLY
  * `2^scene − 1` and the oracle restates every sampled frame hash,
  * every cross-video match, and every overlap fraction from filenames
  * alone, while the Spark side must earn them through real byte-level
  * container parsing.
  */
object GvidFixtures {

  val Width = 16
  val Height = 16

  /** Frame count per video — restated in q170's oracle SQL. */
  def framesOf(docId: Long): Int = (8 + docId % 12).toInt

  /** Scene key of frame `f` of video `docId` (1..62; equal scenes ⇔
    * equal frame hashes) — restated in q170's oracle SQL. */
  def sceneOf(docId: Long, frame: Long): Int =
    (1 + (docId * 5 + frame * 3) % 62).toInt

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
    val dir = java.nio.file.Paths.get("target", "gvid", sfName)
      .toAbsolutePath
    java.nio.file.Files.createDirectories(dir)
    val stale = dir.toFile.listFiles()
    if (stale != null)
      stale.filter(_.getName.endsWith(".gvid")).foreach(_.delete())
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
    ids.foreach { id =>
      val n = framesOf(id)
      val buf = java.nio.ByteBuffer.allocate(16 + n * Width * Height)
      buf.put("GVID".getBytes("US-ASCII"))
      buf.putInt(Width); buf.putInt(Height); buf.putInt(n)
      var f = 0
      while (f < n) {
        val scene = sceneOf(id, f)
        var y = 0
        while (y < Height) {
          var x = 0
          while (x < Width) {
            val cell = (x / 2) + 8 * (y / 2)
            buf.put((if (cell < scene) 200 else 50).toByte)
            x += 1
          }
          y += 1
        }
        f += 1
      }
      java.nio.file.Files.write(
        dir.resolve(f"vid_$id%06d.gvid"), buf.array())
    }
    dir.toString
  }
}
