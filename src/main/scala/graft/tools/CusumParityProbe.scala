package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.SeriesStats

/** Dev tool: bit-exact parity of [[SeriesStats.cusumIntScan]] (the
  * unbounded two-pass prefix-scan form) against [[SeriesStats.cusumInt]]
  * (the bounded-axis fold the q260 oracle restates) on q260's REAL
  * daily-revenue axis — the measurement behind the SCALING.md paragraph
  * retiring the bounded-axis caveat.
  * Usage: runMain graft.tools.CusumParityProbe [sfDir]
  */
object CusumParityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val axis = Tables.lineitem(spark, sfDir)
      .groupBy(datediff(to_date(col("l_shipdate")),
        lit("1970-01-01")).as("day"))
      .agg(expr("sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))" +
        " * 100 AS BIGINT)) div 100").as("dollars"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toSet
    val exact = rows(SeriesStats.cusumInt(axis, "day", "dollars", 20, 2))
    val scan = rows(SeriesStats.cusumIntScan(axis, "day", "dollars", 20, 2))
    println(s"sfDir=$sfDir days=${exact.size} " +
      s"parity=${if (exact == scan) "EXACT" else "MISMATCH"}")
    if (exact != scan) sys.exit(1)
    spark.stop()
  }
}
