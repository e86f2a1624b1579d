package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every registered query on the sf dir
  * from SPARK_GRAFT_SF_DIR and prints ONE JSON line of per-query wall
  * seconds. Each query is forced with a count() action (results are
  * checked separately by Verify; here we measure plan execution).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen once on the smallest sf so per-query numbers
    // measure execution, not first-query classloading
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val secs = (System.nanoTime() - t0) / 1e9
      if (n < 0) System.err.println(s"[bench] $name FAILED")
      // operators may persist() intermediates; drop them so successive
      // queries measure from a clean heap
      spark.catalog.clearCache()
      name -> secs
    }
    // millisecond precision keeps the line compact: the driver captures
    // only a bounded TAIL of stdout, and full-precision doubles pushed
    // the line past it (r3: the line's head was cut mid-key)
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f",
        java.lang.Double.valueOf(v))   // comma-decimal locales break JSON
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
