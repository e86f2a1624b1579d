package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-placement operators: rendezvous (highest-random-weight)
  * hashing for shard assignment with provably minimal movement.
  *
  * Why not `hash(key) mod n` (the [[graft.io.ShardedExport]] rule):
  * mod-sharding reassigns (n−1)/n of ALL keys when a shard is added —
  * at 100 TB that is a full-corpus rewrite to grow capacity by one
  * node. Rendezvous hashing (Thaler & Ravishankar 1998) scores every
  * (key, shard) pair with an independent hash and places the key on
  * its argmax shard; removing a shard only re-homes that shard's own
  * keys, and adding one only claims the keys whose NEW score beats
  * their old maximum — expected |keys|/n movement, the theoretical
  * minimum for a stateless scheme. The score is the repo's one shared
  * 60-bit md5 construction ([[Dedup.md5Hash60]]), so a DuckDB oracle
  * (or any other engine computing placement for readers) derives the
  * identical assignment.
  *
  * Scale shape: the shard list is a tiny literal array unrolled into
  * the projection — assignment is a pure codegen'd map over the scan,
  * no shuffle, no join against a shard table; the movement report
  * aggregates (old, new) pairs map-side into a shard²-sized frame.
  */
object Placement {

  /** The (score, shard) argmax as a column: ties (a 2⁻⁶⁰ event) break
    * to the lexicographically larger shard name via struct ordering —
    * deterministic everywhere. */
  private def bestShard(key: Column, shards: Seq[String],
      seed: String): Column = {
    require(shards.nonEmpty, "need at least one shard")
    require(shards.distinct.size == shards.size,
      s"duplicate shard names in $shards")
    val scored = shards.map { sh =>
      struct(
        Dedup.md5Hash60(concat(key.cast("string"), lit(":"), lit(sh),
          lit(seed))).as("score"),
        lit(sh).as("shard"))
    }
    array_max(array(scored: _*)).getField("shard")
  }

  /** Assign every row its rendezvous shard: `shard` = argmax over
    * `shards` of md5₆₀(key:shard:seed). */
  def rendezvousAssign(df: DataFrame, keyCol: String,
      shards: Seq[String], seed: String): DataFrame =
    df.withColumn("shard", bestShard(col(keyCol), shards, seed))

  /** Movement report between two shard sets: per (shard_before,
    * shard_after) pair, how many keys sit there and whether that pair
    * is a move. The HRW minimal-movement property is directly visible
    * in the output: when `after` ⊃ `before`, every moved row's
    * shard_after is one of the NEW shards (an assertion a test pins);
    * mod-sharding would scatter moves everywhere.
    *
    * @return (shard_before, shard_after, n_keys, moved) */
  def rendezvousMovement(df: DataFrame, keyCol: String,
      before: Seq[String], after: Seq[String], seed: String): DataFrame =
    df.select(
        bestShard(col(keyCol), before, seed).as("shard_before"),
        bestShard(col(keyCol), after, seed).as("shard_after"))
      .groupBy(col("shard_before"), col("shard_after"))
      .agg(count(lit(1)).as("n_keys"))
      .withColumn("moved", col("shard_before") =!= col("shard_after"))
}
