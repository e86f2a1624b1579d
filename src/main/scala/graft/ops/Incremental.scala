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

  /** INCREMENTAL connected components under edge INSERTS: fold a batch
    * of new edges into an existing (id, cluster_id) labeling without
    * re-running the closure over the full edge history.
    *
    * The insight that makes it cheap: new edges can only MERGE
    * existing components (inserts never split), and a merge is fully
    * described on the COMPONENT graph — each new edge whose endpoints
    * carry different labels contributes one (label, label) merge pair;
    * the closure runs on THAT graph (components-touched-sized, not
    * corpus-sized), and the result is a relabel map applied with one
    * broadcast-able join. Endpoints never seen before enter labeled as
    * themselves. Deletions invalidate labels (a removed bridge can
    * split a component) — that genuinely needs recompute or harder
    * machinery (Holm et al.); this operator REFUSES signed input
    * rather than silently corrupting.
    *
    * Output labels keep [[Dedup.duplicateClusters]]' canonical
    * contract — every node labeled with its component's minimum id —
    * so maintained == recomputed exactly (asserted in q301 and the
    * property spec).
    *
    * @param labels (id, cluster_id) — the maintained state; ids
    *               absent from it are unknown nodes
    * @param newEdges (srcCol, dstCol) undirected edge inserts
    * @return (id, cluster_id) covering old nodes ∪ new endpoints */
  def applyEdgesToComponents(labels: DataFrame, newEdges: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    require(!newEdges.columns.contains("sgn"),
      "edge deletions cannot be folded into a component labeling " +
        "(a removed bridge splits a component) — recompute instead")
    val edges = newEdges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val newNodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id"))).distinct()
      .join(labels, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster_id"))
    // materialized (r14): consumed by BOTH endpoint-label joins and
    // the final relabel — unmaterialized, the labels union (and the
    // anti-join behind newNodes, and whatever lineage the caller's
    // labels frame carries) re-executed three times per maintenance
    // call (q301: the old-label closure's output distinct re-ran per
    // consumer). One state-sized checkpoint, the IVM shape at scale.
    val allLabels = Materialize(labels.select(col("id"), col("cluster_id"))
      .unionByName(newNodes))
    val lSrc = allLabels.select(col("id").as("src"),
      col("cluster_id").as("__ls"))
    val lDst = allLabels.select(col("id").as("dst"),
      col("cluster_id").as("__ld"))
    val mergePairs = edges.join(lSrc, "src").join(lDst, "dst")
      .filter(col("__ls") =!= col("__ld"))
      .select(least(col("__ls"), col("__ld")).as("id_a"),
        greatest(col("__ls"), col("__ld")).as("id_b"))
      .distinct()
    // closure on the COMPONENT graph only — touched-components-sized
    val relabel = Dedup.duplicateClustersStar(mergePairs)
      .select(col("id").as("cluster_id"),
        col("cluster_id").as("__new"))
    allLabels.join(relabel, Seq("cluster_id"), "left")
      .select(col("id"),
        coalesce(col("__new"), col("cluster_id")).as("cluster_id"))
  }
}
