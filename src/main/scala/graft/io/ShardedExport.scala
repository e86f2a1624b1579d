package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard publication — the step every curation pipeline ends
  * with: the corpus lands as N JSONL shards whose membership is
  * CONTENT-KEYED (md5-60(id ‖ seed) mod N, the hashSplit construction),
  * so re-runs, cluster resizes, and other engines place every document
  * in the same shard — a re-export after an incremental refresh
  * rewrites only the shards whose membership changed, and a training
  * job can address shards deterministically. Within-shard row order is
  * NOT part of the contract (training loaders shuffle; q110 gates
  * order-free per-shard fingerprints).
  *
  * Shape: one hash repartition by the shard key, then a partitioned
  * JSON write — shard directories are independent, so executors write
  * in parallel and a 100 TB export scales with the cluster. JSONL (not
  * parquet) because that is what tokenizer/training toolchains ingest.
  */
object ShardedExport {

  /** @return the input with its `shard` column, for manifest building */
  def writeJsonlShards(df: DataFrame, idCol: String, outDir: String,
      shards: Int, seed: String): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val withShard = df.withColumn("shard",
      graft.ops.Sampling.hashBucket(col(idCol), seed, shards))
    withShard
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").json(outDir)
    withShard
  }
}
