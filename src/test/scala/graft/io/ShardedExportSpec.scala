package graft.io

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardedExportSpec extends SparkSpec {
  import spark.implicits._

  test("jsonl shards: content round-trips, membership is content-keyed " +
      "and partitioning-independent") {
    val docs = (1L to 100L).map(i => (i, s"doc body number $i"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_shards").toString + "/out"
    ShardedExport.writeJsonlShards(docs, "doc_id", dir, shards = 4,
      seed = "t1")
    val back = spark.read.json(dir)
    assert(back.count() == 100)
    // every row's shard directory matches the hash formula
    val ok = back.select(
      (graft.ops.Sampling.hashBucket($"doc_id", "t1", 4) ===
        $"shard".cast("int")).as("ok")).as[Boolean].collect()
    assert(ok.forall(identity))
    // content survives byte-for-byte
    val texts = back.select($"doc_id", $"text")
      .as[(Long, String)].collect().toMap
    assert((1L to 100L).forall(i => texts(i) == s"doc body number $i"))
    // re-export from a differently partitioned frame → same membership
    val dir2 = Files.createTempDirectory("graft_shards2").toString + "/out"
    ShardedExport.writeJsonlShards(docs.repartition(7), "doc_id", dir2,
      shards = 4, seed = "t1")
    val m1 = back.select($"doc_id", $"shard".cast("int"))
      .as[(Long, Int)].collect().toSet
    val m2 = spark.read.json(dir2).select($"doc_id", $"shard".cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(m1 == m2)
  }
}
