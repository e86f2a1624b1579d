package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import scala.collection.mutable.ArrayBuffer

/** Dev tool: per-stage wall/task/parallelism profile for one query —
  * finds which stage serializes a query whose total task time far
  * exceeds its wall time budget. Usage:
  * runMain graft.tools.QStages <queryName> [sfDir]
  */
object QStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    case class St(id: Int, nTasks: Int, wallMs: Long, taskMs: Long,
      gcMs: Long, site: String)
    val stages = ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        stages.synchronized {
          stages += St(i.stageId, i.numTasks, wall,
            i.taskMetrics.executorRunTime, i.taskMetrics.jvmGCTime,
            i.name + " | rdds: " + i.rddInfos.map(_.name).mkString(","))
        }
      }
    })
    val fn = SparkEntry.queries(name)
    // warm rep, then measured rep
    fn(spark, sfDir).count()
    stages.clear()
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener delivery is async
    Thread.sleep(1000)
    println(f"[qstages] $name rows=$n wall=$wall%.2f s")
    stages.sortBy(-_.taskMs).foreach { s =>
      println(f"[qstages] stage=${s.id}%4d tasks=${s.nTasks}%4d " +
        f"wall=${s.wallMs}%6d ms task=${s.taskMs}%7d ms gc=${s.gcMs}%5d " +
        f"par=${if (s.wallMs > 0) s.taskMs.toDouble / s.wallMs else 0}%5.1f " +
        s.site)
    }
    spark.stop()
  }
}
