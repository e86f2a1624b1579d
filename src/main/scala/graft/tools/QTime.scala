package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: attribute one query's wall time to driver-side phases
  * (analysis / optimization / physical planning) vs execution, across
  * repeats. Usage: runMain graft.tools.QTime <queryName> [sfDir] [reps]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.assertAnalyzed()
      val t2 = System.nanoTime()
      df.queryExecution.optimizedPlan
      val t3 = System.nanoTime()
      df.queryExecution.executedPlan
      val t4 = System.nanoTime()
      val n = df.count()
      val t5 = System.nanoTime()
      def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.2f"
      println(s"[qtime] $name rep=$i rows=$n build=${s(t0, t1)} " +
        s"analyze=${s(t1, t2)} optimize=${s(t2, t3)} plan=${s(t3, t4)} " +
        s"exec=${s(t4, t5)} total=${s(t0, t5)}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
