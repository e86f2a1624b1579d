package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared mid-plan materialization for library entry points that reuse
  * an expensive subtree (n-gram tables, MinHash signatures, range-
  * partitioned scan bases) or must cut lineage per iteration round
  * (duplicate clustering).
  *
  * CAVEATS a caller must know, for EITHER strategy:
  *
  *  - **Eager execution**: constructing the returned DataFrame runs the
  *    upstream Spark jobs AT CALL TIME, not at first action. Library
  *    entry points built on this ([[Dedup.ngramJaccardPairs]],
  *    [[Dedup.crossCorpusJaccardPairs]], [[TextAnalysis.bigramFamiliarity]],
  *    [[TextAnalysis.stripBoilerplateLines]], [[TextAnalysis.tfIdfTop]],
  *    [[Packing.chunkAssignments]], [[Packing.globalRowNumber]]) are
  *    therefore actions, not plan constructors.
  *  - **Block liveness**: the default `localCheckpoint` stores blocks on
  *    the executors that computed them. On a real cluster with executor
  *    loss or dynamic allocation, a lost block makes every downstream
  *    job fail UNRECOVERABLY (lineage was truncated — nothing can be
  *    recomputed). Fine on local[N] and static long-lived executors.
  *
  * For cluster deployments set the session conf
  * `graft.materialize.strategy=checkpoint` (and
  * `sparkContext.setCheckpointDir(...)`): a reliable checkpoint writes
  * blocks to the checkpoint directory and survives executor loss, at
  * the cost of that write. Why not `persist()`: these frames are
  * internal to a single entry-point call — a CacheManager entry would
  * pin the blocks for the whole session because callers never see the
  * frame to unpersist it, while (local)checkpoint blocks free when the
  * frame becomes unreachable.
  */
object Materialize {
  /** Session conf key; values: `localCheckpoint` (default) | `checkpoint`. */
  val StrategyKey = "graft.materialize.strategy"

  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(StrategyKey, "localCheckpoint") match {
      case "localCheckpoint" => df.localCheckpoint()
      case "checkpoint" => df.checkpoint()
      case other => throw new IllegalArgumentException(
        s"$StrategyKey must be localCheckpoint or checkpoint, got $other")
    }

  /** Round-robin-widen a NARROW input before a CPU-heavy per-row map
    * (MinHash/SimHash sketches, n-gram builds): a small table often
    * arrives as one parquet file → one scan partition → ONE task
    * computes every document's sketch while 31 cores idle (measured:
    * the sf0.1 documents table is a single 15 MB file, and the
    * cross-corpus index build ran serial). No-op when the input
    * already has >= defaultParallelism partitions — at 100 TB real
    * tables arrive thousands of partitions wide and the extra
    * exchange would be pure waste; the narrow case this fixes is
    * exactly the one where the exchange is cheap. */
  def widened(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** `.materialized` chain form: `df.groupBy(...).agg(...).materialized`. */
  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materialized: DataFrame = Materialize(df)
    def widened: DataFrame = Materialize.widened(df)
  }
}
