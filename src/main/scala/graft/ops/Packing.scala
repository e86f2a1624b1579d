package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in
  * a stable order into one token stream that is cut into fixed-length
  * chunks ("concatenate then chunk" — documents may straddle chunk
  * boundaries, the GPT-style packing that wastes zero pad tokens).
  * Each document maps to its token interval [start, end) → first/last
  * chunk and in-chunk offset.
  *
  * Pure exact-integer window math: one global prefix sum over the
  * ordering column. On a cluster the global order is a range partition
  * and the cumulative sum is the standard two-pass distributed prefix
  * sum (per-partition totals broadcast back); the per-row math is
  * unchanged — which is why the assignment is reproducible at any
  * cluster size and restatable by any engine (q52's DuckDB twin).
  */
object Packing {

  /** @param tokenCol per-document token count (e.g.
    *                 [[TextAnalysis.tokenCount]])
    *  @param seqLen  chunk length in tokens */
  def chunkAssignments(df: DataFrame, idCol: String, tokenCol: Column,
      seqLen: Int): DataFrame = {
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), tokenCol.cast("long").as("n_tokens"))
      .withColumn("token_end", sum(col("n_tokens")).over(w))
      .withColumn("token_start", col("token_end") - col("n_tokens"))
      // values ≪ 2^53: the double divisions below are exact
      .withColumn("first_chunk",
        floor(col("token_start") / seqLen).cast("long"))
      .withColumn("last_chunk",
        floor((col("token_end") - 1) / seqLen).cast("long"))
      .withColumn("chunk_offset", pmod(col("token_start"), lit(seqLen.toLong)))
  }
}
