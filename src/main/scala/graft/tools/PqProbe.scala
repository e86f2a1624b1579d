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
    for ((m, ks, rr) <- Seq((16, 16, 100))) {
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

      // IVF over the PQ-reconstructed corpus + exact refine (IVF-PQ)
      for (nProbe <- Seq(4, 8)) {
        val index = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cb)
        val short = Similarity.annSearchIvf(
          emb.filter(qp).select(col("vec_id"), col("embedding")),
          index, "vec_id", "embedding", k = rr, nProbe = nProbe)
          .filter(col("neighbor_id") =!= col("id"))
        val qv = emb.filter(qp).select(col("vec_id").cast("long").as("__qid"),
          col("embedding").cast("array<double>").as("__qv"))
        val cv = emb.select(col("vec_id").cast("long").as("__cid"),
          col("embedding").cast("array<double>").as("__cv"))
        val refined = short.select(col("id"), col("neighbor_id"))
          .join(qv, col("id") === col("__qid"))
          .join(cv, col("neighbor_id") === col("__cid"))
          .select(col("id"), col("neighbor_id"),
            Similarity.cosine(col("__qv"), col("__cv")).as("cosine"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        val ivfpq = refined.withColumn("rank",
            org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("id"), col("neighbor_id")).withColumn("__hit", lit(1))
        val rc = exact.join(ivfpq, Seq("id", "neighbor_id"), "left")
          .agg((sum(coalesce(col("__hit"), lit(0))) / count(lit(1)))
            .as("recall")).collect()(0).getDouble(0)
        println(s"IVFPQ m=$m ks=$ks rerank=$rr nProbe=$nProbe recall@$k = $rc")
      }
    }
    spark.stop()
  }
}
