package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Deterministic WAV fixture corpus for the real-audio-decode gate
  * (q91): one PCM WAV per documents row with `doc_id % 10 == 0`,
  * written to `target/wav_fixtures/<sf-name>/` — same fixed-path
  * contract as [[PngFixtures]] (the driver's DuckDB oracle re-lists
  * the files via `glob()` after this JVM exits).
  *
  * Sample rate, channel count, and frame count all derive from doc_id
  * formulas (below), so the oracle restates the full decoded metadata
  * — INCLUDING the duration division — from the filename alone; if
  * `javax.sound.sampled` header parsing breaks, the formulas stop
  * matching. Samples are silence (metadata decode is header-driven;
  * sample content is irrelevant to q91's subject). Driver-side write,
  * bounded subset, idempotent like the other fixture writers.
  */
object WavFixtures {

  /** Metadata formulas — restated in q91's oracle SQL. */
  def rateOf(docId: Long): Int = (8000 + (docId % 4) * 4000).toInt
  def channelsOf(docId: Long): Int = (1 + docId % 2).toInt
  def framesOf(docId: Long): Long = 400 + docId % 600

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
    val dir = java.nio.file.Paths.get("target", "wav_fixtures", sfName)
      .toAbsolutePath
    java.nio.file.Files.createDirectories(dir)
    val stale = dir.toFile.listFiles()
    if (stale != null)
      stale.filter(_.getName.endsWith(".wav")).foreach(_.delete())
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
    ids.foreach { id =>
      val fmt = new javax.sound.sampled.AudioFormat(
        rateOf(id).toFloat, 16, channelsOf(id), true, false)
      val nBytes = framesOf(id).toInt * fmt.getFrameSize
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](nBytes)),
        fmt, framesOf(id))
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE,
        dir.resolve(f"clip_$id%06d.wav").toFile)
    }
    dir.toString
  }
}
