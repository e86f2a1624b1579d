package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive aggregates: apply a
  * signed CDC delta (+1 inserts, −1 deletes) to a materialized
  * (key, n, sum) aggregate WITHOUT rescanning the base table — the
  * maintenance identity count' = count + Σsgn, sum' = sum + Σ(sgn·x).
  *
  * This is the batch twin of what a streaming update-mode aggregation
  * does per micro-batch, and the 100-TB reason it exists: recomputing
  * a day-partitioned aggregate over the full history for every late
  * correction is a full-table scan; folding the correction delta is
  * one shuffle of |delta|. Only distributive/algebraic aggregates
  * (count, sum — and mean/var via sufficient sums) maintain this way;
  * holistic ones (exact distinct, median) need their own state
  * ([[SketchStats]] sketches or re-aggregation).
  *
  * Groups whose maintained count reaches 0 are DROPPED (a deleted-out
  * group must disappear, matching a recompute); a maintained count
  * going negative means the delta deleted rows the base never had —
  * that is surfaced, not clamped: the output carries them with the
  * negative count so a contract check ([[Expectations]]) can fail
  * loudly rather than silently corrupt.
  */
object Incremental {

  /** @param baseAgg   materialized (keyCol, n, s) aggregate
    * @param delta     CDC rows: (keyCol, sgnCol ∈ {+1,−1}, valCol)
    * @return maintained (keyCol, n, s), zero-count groups dropped */
  def applyCdcToAgg(baseAgg: DataFrame, delta: DataFrame,
      keyCol: String, sgnCol: String, valCol: String): DataFrame = {
    val d = delta.groupBy(col(keyCol))
      .agg(sum(col(sgnCol).cast("long")).as("__dn"),
        sum(col(sgnCol).cast("long") * col(valCol).cast("long"))
          .as("__ds"))
    baseAgg.join(d, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("__ds"), lit(0L)))
          .as("s"))
      .filter(col("n") =!= 0L)
  }
}
