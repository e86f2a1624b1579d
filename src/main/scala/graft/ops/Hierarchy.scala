package graft.ops

import org.apache.spark.sql.DataFrame

/** Hierarchical (recursive) queries over parent-pointer tables — the
  * shape chat-conversation TREES arrive in (OpenAssistant/ShareGPT
  * publish message trees as (id, parent_id) rows; SFT prep needs every
  * root-to-node path to render each conversation branch), and equally
  * the category-tree / reporting-chain rollup classic OLAP asks for.
  *
  * Spark-first: Spark 4 ships SQL:2023 recursive CTEs natively (the
  * `UnionLoop` logical operator — each recursion level is one
  * distributed join of the frontier against the child table, planned
  * by Catalyst, level-synchronous like the Pregel ops here), so this
  * is `WITH RECURSIVE` handed to the engine rather than a hand-rolled
  * driver loop. Depth is data-bounded; Spark guards runaways with
  * `spark.sql.cteRecursionLevelLimit` (default 100) — raise it for
  * deeper hierarchies rather than looping manually.
  *
  * Scale shape: level-synchronous joins on the parent key — work per
  * level is |frontier| · join, total Σ|level| = |tree|; no driver
  * materialization. A skewed fan-out node is an ordinary skewed join
  * key (AQE handles it).
  */
object Hierarchy {

  /** Enumerate every root-to-node path: roots are rows with a NULL
    * parent; each row extends its parent's path. Orphans (non-null
    * parent that never appears as an id) are unreachable and emit
    * nothing — surface them with an anti-join upstream if they must
    * fail loudly.
    *
    * @return (node_id, depth from 1 at the root, path — '>'-joined ids
    *         root→node) */
  def rootToNodePaths(df: DataFrame, idCol: String,
      parentCol: String): DataFrame = {
    val spark = df.sparkSession
    val v = "graft_tree_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // materialize the working table ONCE before the recursion (r14):
    // the recursive join re-executes the view's plan EVERY round, so a
    // depth-10 tree re-ran the upstream scan+filter 10 times (measured
    // q220: ~70 stages, most of them per-round FileScanRDD re-reads) —
    // the same reason every hand-rolled loop here checkpoints its
    // round inputs
    Materialize(df).createOrReplaceTempView(v)
    // sql() analyzes eagerly, inlining the view into the returned
    // plan — dropping the view immediately after is safe and keeps
    // the catalog clean across repeated calls
    try spark.sql(
      s"""WITH RECURSIVE __p AS (
         |  SELECT $idCol AS node_id, 1 AS depth,
         |    CAST($idCol AS STRING) AS path
         |  FROM $v WHERE $parentCol IS NULL
         |  UNION ALL
         |  SELECT c.$idCol, p.depth + 1,
         |    concat(p.path, '>', CAST(c.$idCol AS STRING))
         |  FROM $v c JOIN __p p ON c.$parentCol = p.node_id
         |) SELECT node_id, depth, path FROM __p""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  /** Multi-source BFS hop distances via the native recursive CTE:
    * every node reachable from the seed set within `maxDepth` directed
    * hops, with its MINIMUM hop count — link-distance-from-trust as a
    * discrete feature (the companion to [[GraphOps
    * .personalizedPageRankInt]]'s continuous one), crawl-frontier
    * depth labeling, same shape.
    *
    * The recursion enumerates PATH visits and takes min(dist) at the
    * end — correct because UNION ALL + the depth bound keep the
    * enumeration finite, and deliberately simple because Spark's
    * UnionLoop dedups nothing. The cost model is explicit: visits ≤
    * |seeds| · (max out-degree)^maxDepth, fine for sparse link graphs
    * at small depths (out-degree 3, depth 4 → ≤ 81 visits/seed); on a
    * dense graph or deeper horizon use a Pregel min-label loop (the
    * [[graft.ops.Dedup.duplicateClusters]] shape) that dedups per
    * round instead.
    *
    * @param edges (src, dst) directed; seeds one `node` column
    * @return (node, dist) — reached nodes only, dist in [0, maxDepth] */
  def bfsDistances(edges: DataFrame, seeds: DataFrame,
      maxDepth: Int): DataFrame = {
    require(maxDepth >= 0 && maxDepth <= 12,
      s"maxDepth must be in [0, 12] (path enumeration, no dedup), " +
        s"got $maxDepth")
    val spark = edges.sparkSession
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val ev = s"graft_bfs_e_$sfx"
    val sv = s"graft_bfs_s_$sfx"
    // materialized for the same per-round re-execution reason as
    // [[rootToNodePaths]] (seeds only seed round 0, no need)
    Materialize(edges).createOrReplaceTempView(ev)
    seeds.createOrReplaceTempView(sv)
    try spark.sql(
      s"""WITH RECURSIVE __b AS (
         |  SELECT node, 0 AS dist FROM $sv
         |  UNION ALL
         |  SELECT e.dst AS node, b.dist + 1
         |  FROM $ev e JOIN __b b ON e.src = b.node
         |  WHERE b.dist < $maxDepth
         |) SELECT node, CAST(min(dist) AS BIGINT) AS dist
         |FROM __b GROUP BY node""".stripMargin)
    finally {
      spark.catalog.dropTempView(ev)
      spark.catalog.dropTempView(sv)
    }
  }

  /** Leaf paths only — the SFT-rendering view of a message tree: one
    * row per complete conversation branch (a leaf is a node no other
    * row points to as parent). */
  def rootToLeafPaths(df: DataFrame, idCol: String,
      parentCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val paths = rootToNodePaths(df, idCol, parentCol)
    val parents = df.select(col(parentCol).as("__pp"))
      .filter(col("__pp").isNotNull).distinct()
    paths.join(parents, paths("node_id") === parents("__pp"),
        "left_anti")
  }
}
