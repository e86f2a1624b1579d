package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7 atomic publish: write-tmp-then-swap directory rename — readers see
  * the old or the new table, never a half-written one (the reference's
  * whole-file-rewrite "transaction", parse_data.py:222). On a cluster a
  * transactional table format replaces this; the call site is the seam.
  */
object AtomicParquet {

  def read(spark: SparkSession, path: String,
      schemaSource: => DataFrame): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(path))) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schemaSource.schema)
  }

  def publish(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val main = new Path(path)
    val tmp = new Path(path + "__tmp")
    val old = new Path(path + "__old")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(main)) fs.rename(main, old)
    fs.rename(tmp, main)
    fs.delete(old, true)
  }
}
