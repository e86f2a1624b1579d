package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: EXECUTE a comma-separated list of queries in order (the
  * Bench discipline — clear cache between, count to force the final
  * adaptive plan) and print the LAST query's normalized executed-plan
  * text plus both fingerprints. Running it twice with different
  * PREFIX lists and diffing the output is the minimal reproduction of
  * a context-sensitive fingerprint (q334 in r13, q69 found in r14):
  * whatever differs in the normalized text under a changed execution
  * context is exactly what the structural fingerprint must
  * canonicalize — or document as genuinely plan-changing.
  *
  * Usage: runMain graft.tools.PlanProbe <q1,q2,...,qN> [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.register(spark)
    names.foreach { n =>
      spark.catalog.clearCache()
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.count()
      val fp = graft.Bench.planFingerprint(df)
      val fp2 = graft.Bench.planFingerprint2(df)
      println(s"### $n plan=$fp plan2=$fp2")
      if (n == names.last)
        println(graft.Bench.normalizePlanText(
          df.queryExecution.executedPlan.toString))
    }
    spark.stop()
  }
}
