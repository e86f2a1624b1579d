package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `sample()`/`randomSplit()` are partition-order-dependent: a document
  * can migrate between train and test when the cluster size, file
  * layout, or Spark version changes — silent eval contamination. The
  * hash split assigns by content key: bucket = top-60-md5-bits(key ‖
  * seed) mod `buckets`, then cumulative per-mille thresholds. Stable
  * across runs, engines, and cluster sizes, and exactly restatable in
  * any engine with md5 (same construction as
  * [[Dedup.md5Hash60]] — see q51's DuckDB twin).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the key and a salt — ONE
    * shared 60-bit construction ([[Dedup.md5Hash60]]) so the q23/q51
    * oracle twins can never drift apart. */
  def hashBucket(key: Column, seed: String, buckets: Int = 10000): Column =
    pmod(Dedup.md5Hash60(concat(key.cast("string"), lit(seed))),
      lit(buckets.toLong))

  /** Assign every row a named split by hash-bucket thresholds.
    *
    * @param fractions (name, weight) in priority order; weights should
    *                  sum to 1 (the last split absorbs rounding).
    */
  def hashSplit(df: DataFrame, keyCol: String, seed: String,
      fractions: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      buckets: Int = 10000): DataFrame = {
    require(fractions.nonEmpty)
    val b = hashBucket(col(keyCol), seed, buckets)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    var assign: Column = lit(fractions.last._1)
    for (((name, _), c) <- fractions.zip(cum).init.reverse)
      assign = when(b < math.round(c * buckets), lit(name)).otherwise(assign)
    df.withColumn("bucket", b).withColumn("split", assign)
  }
}
