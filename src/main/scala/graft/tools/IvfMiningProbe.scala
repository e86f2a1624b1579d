package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.Similarity

/** Dev tool: raw recall@k of the ANN-backed contrastive mining ops
  * ([[Similarity.hardNegativesIvf]] / [[Similarity.nearestPositivesIvf]])
  * against their exact blocked-kernel oracles — the measurement behind
  * the recall numbers quoted in their scaladoc and q311's floor.
  * Usage: runMain graft.tools.IvfMiningProbe [sfDir] [k] [nProbe]
  */
object IvfMiningProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val k = if (args.length > 1) args(1).toInt else 3
    val nProbe = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    def recall(exact: org.apache.spark.sql.DataFrame,
        approx: org.apache.spark.sql.DataFrame): Double =
      exact.select(col("id"), col("neighbor_id"))
        .join(approx.select(col("id"), col("neighbor_id"))
          .withColumn("__hit", lit(1)), Seq("id", "neighbor_id"), "left")
        .agg((sum(coalesce(col("__hit"), lit(0))) / count(lit(1)))
          .as("recall"))
        .head().getDouble(0)
    val neg = recall(
      Similarity.hardNegativesKernel(emb, "vec_id", "embedding", "label", k),
      Similarity.hardNegativesIvf(emb, "vec_id", "embedding", "label", k,
        nProbe = nProbe))
    val pos = recall(
      Similarity.nearestPositivesKernel(emb, "vec_id", "embedding", "label", k),
      Similarity.nearestPositivesIvf(emb, "vec_id", "embedding", "label", k,
        nProbe = nProbe))
    println(f"sfDir=$sfDir k=$k nProbe=$nProbe " +
      f"hardNegativesIvf_recall=$neg%.4f nearestPositivesIvf_recall=$pos%.4f")
    spark.stop()
  }
}
