package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.Similarity

/** Dev probe: measure PQ ADC recall@k vs the exact kernel. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val k = 3
    val qp = col("vec_id") % 5 === 0
    for ((m, ks, rr) <- Seq((16, 16, 50), (16, 16, 100))) {
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m, ks)
      val exact = Similarity
        .cosineTopKKernelForQueries(emb, "vec_id", "embedding", k, qp)
        .select(col("id"), col("neighbor_id"))
      val approx = Similarity
        .pqAdcTopKForQueries(emb, "vec_id", "embedding", cb, k, qp,
          rerank = rr)
        .select(col("id"), col("neighbor_id")).withColumn("__hit", lit(1))
      val recall = exact.join(approx, Seq("id", "neighbor_id"), "left")
        .agg((sum(coalesce(col("__hit"), lit(0))) / count(lit(1)))
          .as("recall")).collect()(0).getDouble(0)
      println(s"PQ m=$m ks=$ks rerank=$rr recall@$k = $recall")
    }
    spark.stop()
  }
}
