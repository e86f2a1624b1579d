package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.Materialize
import graft.ops.Materialize.MaterializeOps

/** One-off probe for the r14 bigramOcc widening investigation: builds
  * the occurrence frame widened vs not IN THE SAME JVM and times each
  * phase (materialize, the three KN aggregations) with per-phase task
  * CPU from the status store. Usage: runMain graft.tools.WidenProbe [sfDir]
  */
object WidenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null) taskMs += e.taskMetrics.executorRunTime
      })
    def occ(df: DataFrame, widen: Boolean): DataFrame = {
      val base = if (widen) Materialize.widened(df) else df
      val words = split(trim(col("text")), "\\s+")
      base.select(words.as("__ws"))
        .filter(size(col("__ws")) >= 2)
        .select(explode(
          transform(sequence(lit(1), size(col("__ws")) - 1),
            i => struct(
              concat(element_at(col("__ws"), i), lit(" "),
                element_at(col("__ws"), i + 1)).as("bg"),
              element_at(col("__ws"), i).as("w1"),
              element_at(col("__ws"), i + 1).as("w2")))).as("__o"))
        .select(graft.ops.Dedup.md5Hash60(col("__o.bg")).as("__bh"),
          graft.ops.Dedup.md5Hash60(col("__o.w1")).as("__w1h"),
          graft.ops.Dedup.md5Hash60(col("__o.w2")).as("__w2h"))
    }
    def phase(tag: String)(f: => Long): Unit = {
      Thread.sleep(300); val tm0 = taskMs
      val t0 = System.nanoTime()
      val n = f
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[wp] $tag%-28s wall=$w%6.2f task=${(taskMs - tm0) / 1000.0}%7.1f n=$n")
    }
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 =!= 0).select(col("text"))
    (1 to 2).foreach { rep =>
      Seq(false, true).foreach { widen =>
        println(s"== rep=$rep widen=$widen ==")
        var m: DataFrame = null
        phase("materialize occ") { m = occ(docs, widen).materialized; m.count() }
        phase("agg bigrams") {
          m.groupBy(col("__bh")).agg(count(lit(1))).count() }
        phase("agg prefixes+followers") {
          m.groupBy(col("__w1h")).agg(count(lit(1)),
            count_distinct(col("__bh"))).count() }
        phase("distinct types") {
          m.select(col("__bh"), col("__w2h")).distinct().count() }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
