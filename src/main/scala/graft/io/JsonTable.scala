package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, StructType}

/** A1/A9: bit-compat JSON master-table IO. The reference stores the
  * master as one JSON array file rewritten per run; missing/corrupt →
  * empty table (parse_data.py:206-211), NaN scrubbed to null before
  * write (parse_data.py:187-204). Spark-side we use JSON-lines (one
  * object per line — the distributed-friendly framing); the array-file
  * shape is a trivial driver-side concat when bit-compat export matters.
  */
object JsonTable {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.read.schema(schema).json(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** NaN-scrubbed overwrite (A9); atomic via the same tmp-swap as the
    * parquet master. */
  def write(df: DataFrame, path: String): Unit = {
    val scrubbed = df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case DoubleType | FloatType =>
          acc.withColumn(f.name,
            when(isnan(col(f.name)), lit(null)).otherwise(col(f.name)))
        case _ => acc
      }
    }
    val spark = df.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__tmp")
    val main = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    scrubbed.write.mode("overwrite").json(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(main)) fs.rename(main, old)
    fs.rename(tmp, main)
    fs.delete(old, true)
  }
}
