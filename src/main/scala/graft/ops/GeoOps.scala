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
    * @param points one row per point: (idCol, xCol, yCol) with
    *               non-negative integer coordinates
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
}
