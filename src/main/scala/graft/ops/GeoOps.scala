package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial self-join on a planar integer grid: all pairs of points
  * within radius r, without the O(n²) cross join.
  *
  * The standard grid-file / fixed-cell decomposition: bucket every
  * point into a cell of side r, replicate each LEFT point into its
  * 3×3 cell neighborhood, equi-join on the cell id, then verify the
  * exact distance. Any qualifying pair is at most one cell apart in
  * each axis (|dx| <= r < cell span away), so the neighborhood join
  * finds each pair exactly once from the left point's perspective;
  * the `id1 < id2` tiebreak keeps one orientation.
  *
  * Scale shape: ONE equi-join shuffle keyed by cell — candidate count
  * is Σ|cell|·|neighborhood|, linear in n for any bounded point
  * density (vs n² for the naive theta join, which Catalyst can only
  * nested-loop). A pathological all-points-in-one-cell distribution
  * degrades to the dense-pair case and would take [[SkewOps]]-style
  * salting of the heavy cell.
  *
  * Exactness: coordinates, cell ids (floor division of non-negative
  * ints), and the squared-distance predicate dx²+dy² <= r² are all
  * BIGINT — no floating point anywhere, so results are bit-identical
  * in any engine (and no sqrt is ever needed: compare squares).
  */
object GeoOps {

  /** All unordered pairs within Euclidean distance `r`.
    *
    * @param points one row per point: (idCol, xCol, yCol) with integer
    *               coordinates. Non-negative coordinates give uniform
    *               width-r cells; NEGATIVE coordinates are still
    *               CORRECT but not uniform — Spark `div` truncates
    *               toward zero, so the cells straddling zero widen to
    *               2r−1. Pair enumeration survives because two points
    *               within distance r can never land more than one
    *               truncated cell apart on either axis (the zero cell
    *               only absorbs its immediate neighbors), so the 3×3
    *               offset probe still covers every qualifying pair;
    *               the only cost is a denser zero-straddling cell.
    * @return id1 < id2, x/y of both, d2 = exact squared distance
    */
  def radiusPairs(points: DataFrame, idCol: String, xCol: String,
      yCol: String, r: Long): DataFrame = {
    require(r > 0, "radius must be positive")
    val pts = points.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val withCell = pts
      .withColumn("cx", expr(s"x div $r"))
      .withColumn("cy", expr(s"y div $r"))
    // NB: integer `div`, not `/` — Spark SQL `/` on integers is DOUBLE
    // division, which would collapse the 3×3 offset grid.
    val offsets = points.sparkSession.range(9)
      .select((col("id") % 3 - 1).as("ox"),
        expr("id div 3 - 1").as("oy"))
    val lhs = withCell
      .crossJoin(broadcast(offsets))
      .select(col("id").as("id1"), col("x").as("x1"), col("y").as("y1"),
        (col("cx") + col("ox")).as("cx"), (col("cy") + col("oy")).as("cy"))
    val rhs = withCell
      .select(col("id").as("id2"), col("x").as("x2"), col("y").as("y2"),
        col("cx"), col("cy"))
    lhs.join(rhs, Seq("cx", "cy"))
      .filter(col("id1") < col("id2"))
      .withColumn("d2",
        (col("x1") - col("x2")) * (col("x1") - col("x2"))
          + (col("y1") - col("y2")) * (col("y1") - col("y2")))
      .filter(col("d2") <= lit(r * r))
      .select("id1", "id2", "x1", "y1", "x2", "y2", "d2")
  }

  /** Grid-blocked DBSCAN: density clustering from [[radiusPairs]]'
    * linear-in-points neighbor join (never the n² theta join).
    *
    *   - core:   ≥ minPts points within r, COUNTING ITSELF
    *             (|N_ε(p)| ≥ minPts, the textbook rule)
    *   - border: non-core with ≥ 1 core neighbor — attached to the
    *             SMALLEST cluster id among its core neighbors (the
    *             deterministic tie-break for the border ambiguity the
    *             original algorithm leaves order-dependent)
    *   - noise:  everything else, cluster_id = −1
    *
    * Clusters are connected components over CORE–CORE edges
    * ([[Dedup.duplicateClusters]]' min-label propagation, O(log n)
    * rounds), so cluster_id = the component's minimum core id — a pure
    * function of the point set, engine-restatable. An isolated core
    * (minPts = 1 edge case) forms its own singleton cluster.
    *
    * Scale shape: the only superlinear risk is the neighbor join's
    * per-cell density, inherited (and documented) from [[radiusPairs]];
    * everything after is hash aggregation + the bounded-round closure.
    *
    * @return (id, role ∈ 'core'|'border'|'noise', cluster_id) */
  def dbscanGrid(points: DataFrame, idCol: String, xCol: String,
      yCol: String, r: Long, minPts: Int): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    // r14: the point projection, the symmetric pair set, and the
    // flagged table are each consumed by SEVERAL downstream subtrees
    // (points: both sides of the cell join + pts; sym: deg, coreEdges,
    // borderAttach; flagged: coreIds twice + the final join).
    // Unmaterialized, the upstream scan/distinct and the whole
    // neighbor join re-executed per consumer — q282's stage profile
    // showed SEVEN FileScanRDD re-reads of the source and three
    // executions of the pair join (~2.3 s of a 2.9 s wall at sf0.1;
    // 3.0 → 1.7 s after). At scale the same rule holds: a reused
    // point-table-sized frame is cheaper materialized once than
    // recomputed three times.
    val p0 = Materialize(points.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y")))
    val pts = p0.select(col("id"))
    val pairs = Materialize(radiusPairs(p0, "id", "x", "y", r)
      .select(col("id1"), col("id2")))
    // sym stays lazy: both union branches are block re-reads of the
    // materialized pairs — checkpointing it would store the pair set
    // twice for no saved compute
    val sym = pairs.unionByName(
      pairs.select(col("id2").as("id1"), col("id1").as("id2")))
    val deg = sym.groupBy(col("id1").as("id"))
      .agg(count(lit(1)).as("__nbrs"))
    val flagged = Materialize(pts.join(deg, Seq("id"), "left")
      .na.fill(0L, Seq("__nbrs"))
      .withColumn("__core", col("__nbrs") + 1 >= minPts))
    val coreIds = flagged.filter(col("__core")).select(col("id"))
    val coreEdges = sym
      .join(coreIds.select(col("id").as("id1")), "id1")
      .join(coreIds.select(col("id").as("id2")), "id2")
    // star contraction, not min-label propagation: geometric clusters
    // have LONG graph diameters (a chain of touching cells needs one
    // propagation round per hop — measured 10.4 s of sequential rounds
    // at sf0.1), while large-star/small-star converges in O(log n)
    // rounds regardless of diameter; identical output contract
    // (parity asserted in CorpusOpsSpec)
    val comps = Dedup.duplicateClustersStar(coreEdges, "id1", "id2")
    val coreClusters = coreIds.join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id"))
        .as("__cl"))
    // border: min cluster over core neighbors (sym: id1 = the point,
    // id2 = the neighbor — keep only core neighbors)
    val borderAttach = sym
      .join(coreClusters.select(col("id").as("id2"),
        col("__cl").as("__ncl")), "id2")
      .groupBy(col("id1").as("id")).agg(min(col("__ncl")).as("__bcl"))
    flagged
      .join(coreClusters.select(col("id"), col("__cl")), Seq("id"), "left")
      .join(borderAttach, Seq("id"), "left")
      .select(col("id"),
        when(col("__core"), "core")
          .when(col("__bcl").isNotNull, "border")
          .otherwise("noise").as("role"),
        when(col("__core"), col("__cl"))
          .when(col("__bcl").isNotNull, col("__bcl"))
          .otherwise(lit(-1L)).as("cluster_id"))
  }
}
