package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Every query in [[graft.SparkEntry]] receives `(spark, sfDir)` and reads
  * through here, so predicate pushdown / column pruning reach the parquet
  * scan (Catalyst sees a plain `FileScan parquet` relation — no opaque
  * indirection). At cluster scale these would be catalog tables; the
  * loader is the single seam to swap that in.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) (pyarrow default), which
    * Spark's vectorized parquet reader rejects. Read nanos as long and
    * rebuild a microsecond TimestampType column with integer division
    * (`div`, not `/` — ns-since-epoch ≈ 1.7e18 exceeds double's 2^53
    * exact-integer range, so float division would corrupt timestamps).
    */
  private def withNanosTs(spark: SparkSession, dir: String, name: String,
      tsCols: Seq[String]): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, name)
    tsCols.foldLeft(raw) { (df, c) =>
      df.withColumn(c,
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr(s"$c div 1000")))
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    =
    withNanosTs(s, d, "events", Seq("ts"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
