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

  /** Signed delta of an equi-join under CDC on BOTH sides — the
    * classic incremental view-maintenance identity
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * with each output row's sign the PRODUCT of its inputs' signs
    * (an insert joining a delete contributes −1, two deletes +1 —
    * multiset algebra, not special cases). Feed the result into
    * [[applyCdcToAgg]] to maintain any aggregate-over-join without
    * recomputing the join.
    *
    * The 100-TB shape: each term joins a DELTA (small, recent) against
    * one base or the other delta — the base⋈base term, the one that is
    * quadratic in history, never runs. Deltas are broadcast-sized in
    * the late-correction regime this models; Catalyst picks broadcast
    * joins for them against the base scans, so maintenance is two base
    * scans + a tiny join, not a shuffle of either base. Base sides
    * must be delta-EXCLUSIVE snapshots (A_old, B_old): a base that
    * already contains the delta double-counts — callers own that
    * contract, it is not detectable here.
    *
    * Deltas carry a ±1 sign column named `sgnCol` (same name both
    * sides); base rows are implicitly +1. Payload column names must
    * not collide across sides except the join key.
    *
    * @return joined rows (key, A payload, B payload) + `sgnCol` */
  def joinDelta(aOld: DataFrame, dA: DataFrame, bOld: DataFrame,
      dB: DataFrame, keyCol: String, sgnCol: String): DataFrame = {
    val aCols = aOld.columns.toSet
    val bCols = bOld.columns.toSet
    val overlap = (aCols & bCols) - keyCol
    require(overlap.isEmpty, s"payload columns collide: $overlap")
    require(dA.columns.sorted.sameElements((aCols + sgnCol).toArray.sorted)
        && dB.columns.sorted.sameElements((bCols + sgnCol).toArray.sorted),
      s"deltas must be base columns + $sgnCol")
    val sgnA = col(sgnCol).cast("long").as("__sa")
    val sgnB = col(sgnCol).cast("long").as("__sb")
    val a1 = dA.withColumn("__sa", sgnA).drop(sgnCol)
    val b1 = dB.withColumn("__sb", sgnB).drop(sgnCol)
    val t1 = a1.join(bOld.withColumn("__sb", lit(1L)), keyCol)
    val t2 = aOld.withColumn("__sa", lit(1L)).join(b1, keyCol)
    val t3 = a1.join(b1, keyCol)
    val outCols = (aOld.columns ++ bOld.columns.filterNot(_ == keyCol))
      .map(col)
    t1.unionByName(t2).unionByName(t3)
      .select(outCols :+ (col("__sa") * col("__sb")).as(sgnCol): _*)
  }
}
