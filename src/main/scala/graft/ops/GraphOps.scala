package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Materialize.MaterializeOps

/** Web-graph operators for corpus curation: link extraction and an
  * INTEGER-EXACT PageRank — the graph-centrality quality signal the
  * big web corpora actually use (Common Crawl publishes harmonic/
  * PageRank centrality per host; curation pipelines weight or
  * threshold on it).
  *
  * Why integer arithmetic: float PageRank sums incoming contributions
  * in partition order, and double addition is not associative — two
  * runs (or two engines) legitimately differ in the last ulp, which a
  * hash gate cannot tolerate. Ranks here live in parts-per-billion
  * BIGINTs: contributions divide by out-degree with integer `div`,
  * damping is `(d‰ · inflow) div 1000`, and integer addition IS
  * associative — so the result is bit-identical at any parallelism and
  * in any engine (q134's oracle restates three full iterations). The
  * truncation each div introduces is bounded by iters · (1 + maxInDeg)
  * ppb per node — noise far below any curation threshold, and the same
  * noise everywhere.
  */
object GraphOps {

  /** Extract intra-corpus hyperlink edges from an HTML column:
    * `href="..."` values matched against `targetPattern` (one capture
    * group → the target document id). Codegen'd regexp per row, one
    * explode — the edge list is born distributed, no parse service.
    * Duplicate hrefs are ordinary multigraph edges (kept); hrefs not
    * matching the pattern (external links) are dropped.
    *
    * @return (src, dst) long columns */
  def extractLinkEdges(df: DataFrame, idCol: String, htmlCol: String,
      targetPattern: String = "doc_(\\d+)\\.html"): DataFrame =
    df.select(col(idCol).cast("long").as("src"),
        explode(regexp_extract_all(col(htmlCol),
          lit("href=\"([^\"]+)\""), lit(1))).as("__href"))
      .select(col("src"),
        regexp_extract(col("__href"), targetPattern, 1).as("__t"))
      .filter(col("__t") =!= "")
      .select(col("src"), col("__t").cast("long").as("dst"))

  /** Damped PageRank over an (src, dst) edge multiset, integer-exact
    * (see object doc). Per iteration: one `div`-by-out-degree map, one
    * shuffle of contributions keyed by dst, one join back onto the
    * node frame — the Pregel shape; rounds are lineage-cut so the plan
    * stays O(1) across iterations (the duplicate-clustering
    * convention). Dangling nodes (no outlinks) keep their mass out of
    * circulation — the standard simplification; redistribute upstream
    * if total-mass conservation matters. Every node present as src or
    * dst gets a row; isolated nodes should be unioned in by the
    * caller if they must appear.
    *
    * @param totalPpb rank mass at t=0, split evenly (integer div)
    * @return (node, rank_ppb) */
  def pageRankInt(edges: DataFrame, iters: Int = 3,
      dampingPermille: Long = 850L,
      totalPpb: Long = 1000000000L,
      driverCap: Long = DriverGate.EdgeCap): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1, 20], got $iters")
    require(dampingPermille >= 0L && dampingPermille <= 1000L,
      s"dampingPermille must be in [0, 1000], got $dampingPermille")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).materialized
    // driver-local short-circuit (r14 — the kCorePeel gate applied to
    // the Pregel loops): each iteration is 2-3 jobs of fixed launch
    // cost at small edge counts. The ppb arithmetic is INTEGER
    // (associative sums, truncating div on non-negative values), so
    // the in-memory replay is BIT-IDENTICAL to the distributed loop —
    // asserted equal in GraphOpsSpec via driverCap = -1. Multigraph
    // edges collect as-is (contributions are per edge occurrence).
    DriverGate.edges(e, "src", "dst", driverCap).edges match {
      case Some(es) =>
        val spark = edges.sparkSession
        import spark.implicits._
        val (ids, ranks) = pageRankLocal(es, iters, dampingPermille,
          totalPpb, None)
        return spark.createDataset(
            ids.indices.map(i => (ids(i), ranks(i))))
          .toDF("node", "rank_ppb")
      case None => ()
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().materialized
    val n = nodes.count()
    require(n > 0, "pageRankInt needs a non-empty edge list")
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val base = (totalPpb - totalPpb * dampingPermille / 1000L) / n
    var r = nodes.withColumn("rank_ppb", lit(totalPpb / n))
    var it = 0
    while (it < iters) {
      val contrib = e.join(r, e("src") === r("node"))
        .join(outdeg, "src")
        .select(col("dst"),
          expr("rank_ppb div __deg").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__in"))
      r = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(
            s"($dampingPermille * coalesce(__in, 0L)) div 1000"))
            .as("rank_ppb"))
        .materialized
      it += 1
    }
    r
  }

  /** Personalized PageRank with an integer-exact seed restart — the
    * TrustRank shape (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004):
    * instead of teleporting uniformly, ALL restart mass returns to a
    * trusted seed set, so rank measures proximity-to-trust and decays
    * with link distance from the seeds — the standard counter to link
    * farms that accumulate uniform-teleport PageRank from spam
    * cliques. Same ppb-integer arithmetic, shuffle pattern, and
    * dangling-mass convention as [[pageRankInt]]; the only change is
    * WHERE the (1−d) restart lands: split evenly (integer div) over
    * the seeds, zero elsewhere, and the t=0 mass starts entirely on
    * the seeds.
    *
    * @param seeds one `node` column; must intersect the graph
    * @return (node, rank_ppb) for every node appearing as src or dst */
  def personalizedPageRankInt(edges: DataFrame, seeds: DataFrame,
      iters: Int = 2, dampingPermille: Long = 850L,
      totalPpb: Long = 1000000000L,
      driverCap: Long = DriverGate.EdgeCap): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1, 20], got $iters")
    require(dampingPermille >= 0L && dampingPermille <= 1000L,
      s"dampingPermille must be in [0, 1000], got $dampingPermille")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).materialized
    // driver-local short-circuit — [[pageRankInt]]'s gate with the
    // seed-restart arithmetic; the distinct seed frame is counted
    // against the same cap before collecting (a bigger-than-cap seed
    // set falls through to the distributed loop). Empty edge frames
    // fall through so the error contract is exactly the old one.
    DriverGate.edges(e, "src", "dst", driverCap).edges match {
      case Some(es) if es.nonEmpty =>
        val spark = edges.sparkSession
        import spark.implicits._
        val sdf = seeds.select(col("node").cast("long").as("node"))
          .distinct()
        if (sdf.count() <= driverCap) {
          val ss = sdf.as[Long].collect().toSet
          val (ids, ranks) = pageRankLocal(es, iters, dampingPermille,
            totalPpb, Some(ss))
          return spark.createDataset(
              ids.indices.map(i => (ids(i), ranks(i))))
            .toDF("node", "rank_ppb")
        }
      case _ => ()
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().materialized
    val sd = seeds.select(col("node").cast("long").as("node")).distinct()
    val seeded = nodes.join(sd, Seq("node"), "left_semi").materialized
    val k = seeded.count()
    require(k > 0, "seed set does not intersect the graph")
    val flag = nodes.join(
      seeded.withColumn("__is_seed", lit(true)), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("__is_seed"), lit(false)).as("__is_seed"))
      .materialized
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val base = (totalPpb - totalPpb * dampingPermille / 1000L) / k
    var r = flag.withColumn("rank_ppb",
      when(col("__is_seed"), lit(totalPpb / k)).otherwise(lit(0L)))
    var it = 0
    while (it < iters) {
      val contrib = e.join(r, e("src") === r("node"))
        .join(outdeg, "src")
        .select(col("dst"), expr("rank_ppb div __deg").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__in"))
      r = flag.join(contrib, flag("node") === contrib("dst"), "left")
        .select(flag("node"), col("__is_seed"),
          (when(col("__is_seed"), lit(base)).otherwise(lit(0L)) + expr(
            s"($dampingPermille * coalesce(__in, 0L)) div 1000"))
            .as("rank_ppb"))
        .materialized
      it += 1
    }
    r.select(col("node"), col("rank_ppb"))
  }

  /** HITS hub/authority scores (Kleinberg 1999, JACM 46(5)) over an
    * (src, dst) edge multiset — the OTHER graph-centrality quality
    * signal web curation uses: PageRank rewards being linked FROM
    * important pages; HITS separates "links to good content" (hub)
    * from "is good content" (authority), the split a link-farm /
    * directory-page classifier wants. Integer-exact in parts-per-
    * billion BIGINTs for the same reason as [[pageRankInt]] (float
    * sums are partition-order-dependent; integer sums are not).
    *
    * Per iteration (the mutual recursion, L1-normalized):
    * auth'(v) = Σ_{u→v} hub(u), then auth = auth' · 10⁹ div Σauth';
    * hub'(u) = Σ_{u→v} auth(v), then hub = hub' · 10⁹ div Σhub'.
    * The normalization total is an exact integer aggregate, so every
    * division is integer and the fixpoint replays bit-for-bit on any
    * engine — q218's oracle restates two full iterations. Truncation
    * from the normalizing div is < 1 ppb per node per step.
    *
    * Scale shape: per half-iteration one shuffle of edge
    * contributions keyed by the receiving node + one 1-row total
    * aggregate, rounds lineage-cut — the [[pageRankInt]] Pregel
    * shape. Nodes with no in-edges hold authority 0 (hub 0 for no
    * out-edges); every node appearing as src or dst gets a row.
    *
    * @return (node, authority_ppb, hub_ppb) */
  def hitsInt(edges: DataFrame, iters: Int = 2,
      totalPpb: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1, 20], got $iters")
    // DISTINCT edges: HITS is defined on the 0/1 adjacency matrix
    // (Kleinberg §2 — duplicate hrefs don't double a page's
    // endorsement), and it also bounds every raw score by the L1
    // total 10⁹, keeping the ·10⁹ normalization multiply inside Long
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct().materialized
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().materialized
    val n = nodes.count()
    require(n > 0, "hitsInt needs a non-empty edge list")
    // auth and hub ride SEPARATE frames through the loop (r14): each
    // half-step only reads the OTHER side's scores, so the per-round
    // auth⋈hub join + materialize the old loop carried existed purely
    // to rebuild a combined row — join once AFTER the loop instead
    // (iters × (one shuffle join + one checkpoint job) saved).
    var authF = nodes.withColumn("authority_ppb", lit(totalPpb / n))
    var hubF = nodes.withColumn("hub_ppb", lit(totalPpb / n))
    var it = 0
    def normalized(raw: DataFrame, valCol: String): DataFrame = {
      // materialize raw FIRST (r14): computing the total over the
      // unmaterialized frame executed the whole join+agg subtree for
      // the 1-row collect and then AGAIN for the post-div checkpoint —
      // now the heavy subtree runs once, the total is a block-read
      // job, and the div is a lazy projection over the blocks (trivial
      // per-row arithmetic for the ≤2 consumers of each half-step).
      // Σ over a non-empty edge-touched frame; 0 only if every score
      // upstream collapsed to 0 (all mass truncated away) — guard the
      // div so the degenerate graph yields zeros, not a crash
      val m = Materialize(raw)
      val total = m.agg(sum(col(valCol))).head().getLong(0)
      if (total <= 0L) m.withColumn(valCol, lit(0L))
      else m.withColumn(valCol,
        expr(s"($valCol * ${totalPpb}L) div ${total}L"))
    }
    while (it < iters) {
      val authIn = e.join(hubF, e("src") === hubF("node"))
        .groupBy(col("dst")).agg(sum(col("hub_ppb")).as("__a"))
      authF = normalized(
        nodes.join(authIn, nodes("node") === authIn("dst"), "left")
          .select(col("node"), coalesce(col("__a"), lit(0L)).as("authority_ppb")),
        "authority_ppb")
      val hubIn = e.join(authF, e("dst") === authF("node"))
        .groupBy(col("src")).agg(sum(col("authority_ppb")).as("__h"))
      hubF = normalized(
        nodes.join(hubIn, nodes("node") === hubIn("src"), "left")
          .select(col("node"), coalesce(col("__h"), lit(0L)).as("hub_ppb")),
        "hub_ppb")
      it += 1
    }
    authF.join(hubF, "node")
      .select(col("node"), col("authority_ppb"), col("hub_ppb"))
  }

  /** Per-node triangle counts over an undirected edge multiset, via
    * the degree-ordered node-iterator (Schank & Wagner 2005; the
    * MapReduce restatement is Suri & Vassilvitskii's "Counting
    * Triangles and the Curse of the Last Reducer", WWW 2011). Naive
    * wedge enumeration explodes on hub nodes — a degree-10⁶ node owns
    * 10¹² wedges. Orienting every edge from the (degree, id)-smaller
    * endpoint to the larger makes each triangle countable exactly once
    * at its smallest corner and bounds every node's oriented
    * out-degree by O(√m), so the wedge join is O(m^{3/2}) worst-case
    * TOTAL, independent of skew — the curse of the last reducer is the
    * exact failure this orientation exists to kill. Plan: dedup to the
    * canonical (a<b) simple edge set, one degree aggregation, one
    * self-join to enumerate oriented wedges, one semi-ish inner join
    * against the oriented edge set to close them, then explode each
    * found triangle to its three corners and count per node. All
    * joins are shuffle hash/sort-merge on node keys — no broadcast of
    * anything graph-sized, no driver materialization.
    *
    * Self-loops drop (a triangle is three DISTINCT nodes); duplicate
    * edges collapse (counts are on the simple graph, the Kleinberg
    * 0/1-adjacency convention [[hitsInt]] uses).
    *
    * @param edges (src, dst) columns, any direction, multigraph ok
    * @return (node, n_triangles) for every node of the simple graph,
    *         zeros included */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // canonical simple edges a < b
    val e = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct().materialized
    // materialized (r14): consumed THREE times — both sides of the
    // orientation join (da/db) and the final all-nodes left join —
    // and each unmaterialized consumer re-ran the union + count
    // aggregation over 2|e| rows (q226 profile: 14.5 s task in a
    // 2.8 s-wall query, the deg subtree the dominant repeat)
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .materialized
    // orient from (deg, id)-smaller to larger: total order, so the
    // oriented graph is a DAG with out-degree ≤ O(√m)
    val da = deg.select(col("node").as("a"), col("deg").as("__da"))
    val db = deg.select(col("node").as("b"), col("deg").as("__db"))
    val oriented = e.join(da, "a").join(db, "b")
      .select(
        when(col("__da") < col("__db")
          || (col("__da") === col("__db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("lo"),
        when(col("__da") < col("__db")
          || (col("__da") === col("__db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("hi"))
      .materialized
    // wedges at the (deg,id)-smallest corner: two oriented out-edges
    // lo→x, lo→y, deduped to x < y by id; the closing x–y edge is
    // looked up in the canonical simple edge set e itself (already
    // id-ordered a < b). Every triangle has exactly one corner that is
    // the (deg,id)-minimum of its three, so it's counted exactly once.
    val w1 = oriented.select(col("lo"), col("hi").as("x"))
    val w2 = oriented.select(col("lo"), col("hi").as("y"))
    val wedges = w1.join(w2, "lo").filter(col("x") < col("y"))
    val tris = wedges.join(e,
      col("x") === col("a") && col("y") === col("b"))
      .select(col("lo"), col("x"), col("y"))
    val perNode = tris
      .select(explode(array(col("lo"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.select(col("node"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Bounded-round k-core peel (Seidman 1983's cores via the
    * Matula–Beck peeling): each round drops every node whose degree
    * in the SURVIVING subgraph is < k, then prunes the edges it
    * carried; after enough rounds the fixpoint is the k-core — the
    * standard community-density filter (a spam clique survives
    * PageRank dilution but not a core cut; conversely a genuine dense
    * community survives the peel). Rounds are EXPLICIT and part of
    * the operator's contract: `rounds` ≥ the graph's peel depth gives
    * the exact k-core, fewer gives the bounded peel, and the
    * `converged` flag (round R−1 survivor count == round R's — the
    * survivor sets are nested, so count equality is set equality)
    * reports which one you got instead of leaving it implicit. Per
    * round: one degree aggregation + two semi-joins, lineage-cut —
    * the [[pageRankInt]] Pregel shape, O(rounds) plan depth at any
    * graph size. EARLY EXIT: survivor sets are nested, so a round that
    * drops zero nodes (count equality == set equality) is the fixpoint
    * and remaining rounds are skipped — the survivor count was already
    * paid per round, so convergence detection is free and the output
    * (including `converged`) is unchanged by construction
    * (round-invariance asserted in GraphOpsSpec).
    *
    * @param roundsOut if set, receives the number of rounds actually
    *                  executed (early exit ≤ rounds) — observability
    *                  for tests and the SCALING.md round measurements
    * @return (node, in_core, converged) for every node of the simple
    *         graph */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int,
      roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None,
      driverCap: Long = DriverKCoreCap): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 50,
      s"rounds must be in [1, 50], got $rounds")
    // explicit width on the canonicalizing distinct (the prefixFrame
    // pattern): the raw edge stream is often a join fan-out whose
    // BYTES are small — AQE's byte-coalescing squeezes the dedup onto
    // a handful of partitions and the CPU-bound canonicalization runs
    // near-serial (measured on q241's co-purchase build: task ≈ wall).
    // distinct() reuses the (a, b) hash partitioning, so this pins
    // width without an extra exchange.
    val par = edges.sparkSession.sparkContext.defaultParallelism
    val e0 = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .repartition(par, col("a"), col("b"))
      .distinct().materialized
    // driver-local short-circuit (r13; the Dedup.DriverUnionFindCap
    // precedent, gate logic shared via DriverGate since r14): each
    // distributed peel round is a degree aggregation + two semi-joins
    // + a count — ~4 job launches, ~0.7 s of fixed cost at small edge
    // counts regardless of data volume. Below the cap (canonical edges
    // already materialized — 16 B/row ≈ 32 MB at 2 M) the EXACT
    // synchronized peel replays in driver memory: same rounds
    // contract, same count-equality early exit, same converged flag;
    // the distributed loop below is untouched and remains the
    // 100×-scale path (ids are already cast long, so no schema shift
    // across the gate). Forced distributed in GraphOpsSpec via
    // driverCap = -1 and asserted equal.
    DriverGate.edges(e0, "a", "b", driverCap).edges match {
      case Some(es) =>
        val spark = edges.sparkSession
        import spark.implicits._
        val (nodeIds, inCore, converged, r) = kCorePeelLocal(es, k, rounds)
        roundsOut.foreach(_.set(r))
        return spark.createDataset(
            nodeIds.indices.map(i => (nodeIds(i), inCore(i), converged)))
          .toDF("node", "in_core", "converged")
      case None => ()
    }
    val nodes = e0.select(col("a").as("node"))
      .union(e0.select(col("b").as("node"))).distinct().materialized
    var e = e0
    var survivors = nodes
    var prevCount = survivors.count()
    var lastCount = prevCount
    var r = 0
    var fixed = false
    while (r < rounds && !fixed) {
      val deg = e.select(col("a").as("node"))
        .union(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("__deg"))
      survivors = deg.filter(col("__deg") >= k)
        .select(col("node")).materialized
      e = e
        .join(survivors.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(survivors.select(col("node").as("b")), Seq("b"), "left_semi")
        .materialized
      prevCount = lastCount
      lastCount = survivors.count()
      fixed = prevCount == lastCount
      r += 1
    }
    roundsOut.foreach(_.set(r))
    val converged = prevCount == lastCount
    nodes.join(survivors.withColumn("__in", lit(true)),
        Seq("node"), "left")
      .select(col("node"),
        coalesce(col("__in"), lit(false)).as("in_core"),
        lit(converged).as("converged"))
  }

  /** Edge-count ceiling for [[kCorePeel]]'s driver-local replay — the
    * [[Dedup.DriverUnionFindCap]] rationale: 2 M canonical (long,
    * long) edges ≈ 32 MB on the driver, far under any sane driver
    * heap, while the distributed loop's per-round fixed cost dominates
    * wall time at these sizes. One shared constant ([[DriverGate]])
    * since r14, so the cap/byte math cannot drift between the three
    * gated operators. */
  private[ops] val DriverKCoreCap = DriverGate.EdgeCap

  /** The synchronized bounded-round peel, in memory — semantics
    * IDENTICAL to the distributed loop in [[kCorePeel]] by
    * construction: same per-round (degree ≥ k → survivors → edge
    * restriction), same nested-survivor count-equality early exit,
    * same converged read. Property-pinned equal to the forced
    * distributed path in GraphOpsSpec.
    * @return (final survivor set, converged, rounds executed) */
  /** @return (sorted node ids, per-node in-core flags aligned to the
    *         ids, converged, rounds executed). Primitive-array form
    *         (r14): the boxed HashMap/Set version spent ~0.5–1 s on
    *         q241's 1.2 M collected edges (2·|E| boxed map updates per
    *         round, an Array[(Long,Long)] filter allocation per round,
    *         plus the caller's boxed first-seen node re-scan); here
    *         ids index once into a sorted array and every round is
    *         three primitive-array sweeps. Same synchronized-peel
    *         semantics as the distributed loop — count-equality early
    *         exit, nested survivor sets, converged flag — asserted
    *         equal against it in GraphOpsSpec. */
  private[ops] def kCorePeelLocal(es: Array[(Long, Long)], k: Int,
      rounds: Int): (Array[Long], Array[Boolean], Boolean, Int) = {
    val m = es.length
    val all = new Array[Long](2 * m)
    var i = 0
    while (i < m) {
      all(2 * i) = es(i)._1; all(2 * i + 1) = es(i)._2; i += 1
    }
    java.util.Arrays.sort(all)
    var n = 0
    i = 0
    while (i < all.length) {
      if (n == 0 || all(i) != all(n - 1)) { all(n) = all(i); n += 1 }
      i += 1
    }
    val ids = java.util.Arrays.copyOf(all, n)
    val ea = new Array[Int](m)
    val eb = new Array[Int](m)
    i = 0
    while (i < m) {
      ea(i) = java.util.Arrays.binarySearch(ids, es(i)._1)
      eb(i) = java.util.Arrays.binarySearch(ids, es(i)._2)
      i += 1
    }
    val alive = new Array[Boolean](m)
    java.util.Arrays.fill(alive, true)
    val deg = new Array[Int](n)
    val inCore = new Array[Boolean](n)
    var prev = n.toLong
    var last = prev
    var r = 0
    var fixed = false
    while (r < rounds && !fixed) {
      java.util.Arrays.fill(deg, 0)
      i = 0
      while (i < m) {
        if (alive(i)) { deg(ea(i)) += 1; deg(eb(i)) += 1 }
        i += 1
      }
      var surv = 0L
      i = 0
      while (i < n) {
        inCore(i) = deg(i) >= k
        if (inCore(i)) surv += 1
        i += 1
      }
      i = 0
      while (i < m) {
        if (alive(i) && !(inCore(ea(i)) && inCore(eb(i))))
          alive(i) = false
        i += 1
      }
      prev = last
      last = surv
      fixed = prev == last
      r += 1
    }
    (ids, inCore, prev == last, r)
  }

  /** Driver-local replay of [[pageRankInt]] (and, with `seeds` set,
    * [[personalizedPageRankInt]]) — BIT-IDENTICAL to the distributed
    * loops: ppb ranks are integers, contribution sums are associative,
    * and `div` on the non-negative operands here equals Scala `/`.
    * Multigraph edge occurrences each contribute (outdeg counts
    * occurrences), exactly like the distributed out-degree join.
    * @return (sorted node ids, rank_ppb aligned to the ids) */
  private[ops] def pageRankLocal(es: Array[(Long, Long)], iters: Int,
      dampingPermille: Long, totalPpb: Long,
      seeds: Option[scala.collection.Set[Long]])
      : (Array[Long], Array[Long]) = {
    val m = es.length
    val all = new Array[Long](2 * m)
    var i = 0
    while (i < m) {
      all(2 * i) = es(i)._1; all(2 * i + 1) = es(i)._2; i += 1
    }
    java.util.Arrays.sort(all)
    var n = 0
    i = 0
    while (i < all.length) {
      if (n == 0 || all(i) != all(n - 1)) { all(n) = all(i); n += 1 }
      i += 1
    }
    val ids = java.util.Arrays.copyOf(all, n)
    val esrc = new Array[Int](m)
    val edst = new Array[Int](m)
    i = 0
    while (i < m) {
      esrc(i) = java.util.Arrays.binarySearch(ids, es(i)._1)
      edst(i) = java.util.Arrays.binarySearch(ids, es(i)._2)
      i += 1
    }
    val outdeg = new Array[Long](n)
    i = 0
    while (i < m) { outdeg(esrc(i)) += 1L; i += 1 }
    val isSeed: Array[Boolean] = seeds match {
      case Some(ss) =>
        val f = new Array[Boolean](n)
        i = 0
        while (i < n) { f(i) = ss.contains(ids(i)); i += 1 }
        f
      case None => null
    }
    val k: Long =
      if (isSeed == null) n.toLong
      else {
        var c = 0L
        i = 0
        while (i < n) { if (isSeed(i)) c += 1L; i += 1 }
        c
      }
    require(k > 0, "seed set does not intersect the graph")
    val base = (totalPpb - totalPpb * dampingPermille / 1000L) / k
    val rank = new Array[Long](n)
    i = 0
    while (i < n) {
      rank(i) =
        if (isSeed == null) totalPpb / n
        else if (isSeed(i)) totalPpb / k
        else 0L
      i += 1
    }
    val inflow = new Array[Long](n)
    var it = 0
    while (it < iters) {
      java.util.Arrays.fill(inflow, 0L)
      i = 0
      while (i < m) {
        inflow(edst(i)) += rank(esrc(i)) / outdeg(esrc(i))
        i += 1
      }
      i = 0
      while (i < n) {
        val b = if (isSeed == null || isSeed(i)) base else 0L
        rank(i) = b + dampingPermille * inflow(i) / 1000L
        i += 1
      }
      it += 1
    }
    (ids, rank)
  }

  /** Driver-local replay of [[labelPropagation]]'s synchronous
    * min-label-tie rounds over the SYMMETRIC distinct pair list —
    * deterministic integer semantics, so exactly the distributed
    * result (most-frequent neighbor label, ties to the smallest; a
    * zero-change round is the fixpoint).
    * @param prs the symmetric (a, b) rows — BOTH directions present
    * @return (sorted node ids, labels aligned to ids, converged,
    *         rounds executed) */
  private[ops] def labelPropagationLocal(prs: Array[(Long, Long)],
      rounds: Int): (Array[Long], Array[Long], Boolean, Int) = {
    val m = prs.length
    val all = new Array[Long](2 * m)
    var i = 0
    while (i < m) {
      all(2 * i) = prs(i)._1; all(2 * i + 1) = prs(i)._2; i += 1
    }
    java.util.Arrays.sort(all)
    var n = 0
    i = 0
    while (i < all.length) {
      if (n == 0 || all(i) != all(n - 1)) { all(n) = all(i); n += 1 }
      i += 1
    }
    val ids = java.util.Arrays.copyOf(all, n)
    // CSR adjacency from the directed rows (a ← neighbor b)
    val deg = new Array[Int](n)
    val pa = new Array[Int](m)
    val pb = new Array[Int](m)
    i = 0
    while (i < m) {
      pa(i) = java.util.Arrays.binarySearch(ids, prs(i)._1)
      pb(i) = java.util.Arrays.binarySearch(ids, prs(i)._2)
      deg(pa(i)) += 1
      i += 1
    }
    val off = new Array[Int](n + 1)
    i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val fill = java.util.Arrays.copyOf(off, n)
    val adj = new Array[Int](m)
    i = 0
    while (i < m) { adj(fill(pa(i))) = pb(i); fill(pa(i)) += 1; i += 1 }
    var maxDeg = 0
    i = 0
    while (i < n) {
      if (deg(i) > maxDeg) maxDeg = deg(i)
      i += 1
    }
    var lab: Array[Long] = ids.clone()
    var changed = -1L
    var r = 0
    val buf = new Array[Long](maxDeg)
    while (r < rounds && changed != 0L) {
      val next = new Array[Long](n)
      var ch = 0L
      i = 0
      while (i < n) {
        val d = off(i + 1) - off(i)
        var j = 0
        while (j < d) { buf(j) = lab(adj(off(i) + j)); j += 1 }
        java.util.Arrays.sort(buf, 0, d)
        // longest run wins; sorted ascending, so strict > keeps the
        // SMALLEST label on count ties — the min-label tie rule
        var bestLab = Long.MaxValue
        var bestC = 0
        j = 0
        while (j < d) {
          var e2 = j + 1
          while (e2 < d && buf(e2) == buf(j)) e2 += 1
          if (e2 - j > bestC) { bestC = e2 - j; bestLab = buf(j) }
          j = e2
        }
        next(i) = bestLab
        if (next(i) != lab(i)) ch += 1L
        i += 1
      }
      lab = next
      changed = ch
      r += 1
    }
    (ids, lab, changed == 0L, r)
  }

  /** Synchronous label propagation (Raghavan et al. 2007) with the
    * deterministic min-label tie rule: every node starts as its own
    * label; each round it adopts the label most frequent among its
    * neighbors, ties to the SMALLEST label — the async random-order
    * variant of the paper is irreproducible by construction, so this
    * is the synchronous determinization an oracle can replay. The
    * cheap community detector between connected components (too
    * coarse — everything touching is one component) and modularity
    * methods (too expensive at 100 TB): the label-spam/link-farm
    * triage pass.
    *
    * Rounds are bounded and part of the contract (synchronous LPA can
    * oscillate on bipartite structures — a fixpoint is NOT
    * guaranteed); the `converged` flag compares the last two label
    * assignments so the caller knows which they got. Per round: one
    * neighbor-label count aggregation + one argmax struct-max (count
    * desc, label asc — no window), lineage-cut — the Pregel shape.
    * EARLY EXIT: the synchronous update is a deterministic function of
    * the previous assignment, so a round that changes ZERO labels is a
    * fixpoint and remaining rounds are skipped. The per-round change
    * count is one equi-join + count on the two materialized node-sized
    * label frames (it also IS the `converged` computation, hoisted into
    * the loop — the exhausted-rounds path pays exactly what it paid
    * before); output unchanged by construction (round-invariance
    * asserted in GraphOpsSpec).
    *
    * @param edges (src, dst), any direction; self-loops dropped
    * @param roundsOut if set, receives the rounds actually executed
    * @return (node, label, converged) */
  def labelPropagation(edges: DataFrame, rounds: Int,
      roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None,
      driverCap: Long = DriverGate.EdgeCap): DataFrame = {
    require(rounds >= 1 && rounds <= 50,
      s"rounds must be in [1, 50], got $rounds")
    val e = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .materialized
    // driver-local short-circuit (r14): the synchronous min-label-tie
    // update is a deterministic integer function of the previous
    // assignment, so the in-memory replay matches the distributed
    // rounds exactly (GraphOpsSpec, driverCap = -1 forces
    // distributed). Gate probes the symmetric frame (2·|e| rows
    // against the cap); q251 paid ~4 jobs/round of launch cost.
    DriverGate.edges(und, "a", "b", driverCap).edges match {
      case Some(prs) if prs.nonEmpty =>
        val spark = edges.sparkSession
        import spark.implicits._
        val (ids, labs, converged, r) = labelPropagationLocal(prs, rounds)
        roundsOut.foreach(_.set(r))
        return spark.createDataset(
            ids.indices.map(i => (ids(i), labs(i), converged)))
          .toDF("node", "label", "converged")
      case _ => ()
    }
    val nodes = und.select(col("a").as("node")).distinct().materialized
    var labels = nodes.withColumn("lab", col("node"))
    var changed = -1L
    var r = 0
    while (r < rounds && changed != 0L) {
      val prev = labels
      val counts = und
        .join(labels.select(col("node").as("b"), col("lab")), "b")
        .groupBy(col("a").as("node"), col("lab"))
        .agg(count(lit(1)).as("__c"))
      labels = counts
        .groupBy(col("node"))
        .agg(max(struct(col("__c").as("c"), (-col("lab")).as("nl")))
          .as("__m"))
        .select(col("node"), (-col("__m.nl")).as("lab"))
        .materialized
      changed = labels.as("x")
        .join(prev.select(col("node"), col("lab").as("__pl")), "node")
        .filter(col("lab") =!= col("__pl")).count()
      r += 1
    }
    roundsOut.foreach(_.set(r))
    labels.select(col("node"), col("lab").as("label"),
      lit(changed == 0L).as("converged"))
  }

  /** Bounded-hop single-source-set WEIGHTED shortest paths — the
    * Bellman–Ford/Pregel rounds form ([[pageRankInt]]'s shape): each
    * round relaxes every edge once (one equi-join on `src` + one
    * min-aggregation), so after `maxHops` rounds `dist` is the exact
    * minimum weight over all paths of ≤ maxHops edges from any seed.
    * Plan depth is O(maxHops) with lineage cut per round; the frontier
    * never enumerates paths (the recursive-CTE enumeration the oracle
    * uses is exponential in hops and fine only at test scale —
    * [[graft.ops.Hierarchy.bfsDistances]] documents the same split
    * for the unweighted case).
    *
    * Exact BIGINT weights; unreachable-within-bound nodes are absent
    * (callers outer-join if they want infinities).
    *
    * EARLY EXIT: relaxation is monotone (dists only decrease, the node
    * set only grows), so a round that adds no node AND improves no dist
    * is the fixpoint — detected with one count + one filtered-join
    * count per round against the two materialized node-sized dist
    * frames, and remaining rounds are skipped. Output unchanged by
    * construction (round-invariance asserted in GraphOpsSpec).
    *
    * @param roundsOut if set, receives the rounds actually executed
    */
  def shortestPathsBounded(edges: DataFrame, seeds: DataFrame,
      maxHops: Int,
      roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None)
      : DataFrame = {
    require(maxHops >= 0 && maxHops <= 50,
      s"maxHops must be in [0, 50], got $maxHops")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"),
      col("w").cast("long").as("w")).materialized
    var dist = seeds.select(col("node").cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0L)).materialized
    var nDist = dist.count()
    var hop = 0
    var fixed = false
    while (hop < maxHops && !fixed) {
      val prev = dist
      val prevN = nDist
      val relaxed = dist.join(e, dist("node") === e("src"))
        .select(e("dst").as("node"), (dist("dist") + e("w")).as("dist"))
      dist = dist.union(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .materialized
      nDist = dist.count()
      fixed = nDist == prevN &&
        dist.join(prev.select(col("node"), col("dist").as("__pd")), "node")
          .filter(col("dist") < col("__pd")).count() == 0L
      hop += 1
    }
    roundsOut.foreach(_.set(hop))
    dist
  }

  /** WEISFEILER–LEHMAN label refinement (Weisfeiler & Lehman 1968; the
    * 1-WL color refinement behind WL graph kernels, Shervashidze et
    * al. 2011) — per-node STRUCTURAL signatures: two nodes share a
    * round-R label iff their radius-R neighborhood trees are
    * indistinguishable to 1-WL. The structural-dedup primitive for
    * graph-shaped records (parse trees, site link graphs, schema
    * graphs): duplicate STRUCTURE groups by label even when ids
    * differ, and a whole graph's signature is the sorted multiset of
    * its node labels.
    *
    * Determinism across engines: label_0 = degree as a decimal string;
    * each round re-labels as md5(own || '|' || neighbors' labels
    * sorted and comma-joined) — md5 hex and binary string sort are
    * identical in any engine (the q163 seeded-hash convention), so a
    * DuckDB oracle restates every round verbatim.
    *
    * Scale shape: per round ONE adjacency join + one sorted-collect
    * aggregation keyed by node (per-node state is its neighbor-label
    * list — degree-bounded, the same bound the degree computation
    * already carries; a pathological hub degrades to one wide row,
    * not a shuffle explosion), lineage-cut — the Pregel shape,
    * O(rounds) plan depth.
    *
    * @param edges (src, dst) any direction; self-loops dropped. Node
    *              ids keep their input type (any orderable type — the
    *              canonicalization only needs least/greatest)
    * @param rounds refinement depth R (small — 1-WL stabilizes within
    *               diameter+1 rounds; 2-3 suffices for dedup)
    * @return (node, wl_label) — md5 hex (degree string at rounds = 0)
    */
  def wlLabels(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0 && rounds <= 8,
      s"rounds must be in [0, 8], got $rounds")
    val e = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .materialized
    var labels = und.groupBy(col("a").as("node"))
      .agg(count(lit(1)).cast("string").as("lab")).materialized
    var r = 0
    while (r < rounds) {
      labels = und
        .join(labels.select(col("node").as("b"), col("lab")), "b")
        .groupBy(col("a").as("node"))
        .agg(concat_ws(",", sort_array(collect_list(col("lab"))))
          .as("__nbrs"))
        .join(labels, "node")
        .select(col("node"),
          md5(concat(col("lab"), lit("|"), col("__nbrs"))).as("lab"))
        .materialized
      r += 1
    }
    labels.select(col("node"), col("lab").as("wl_label"))
  }

  /** WHOLE-GRAPH WL signature — the graph-shaped dedup grouping
    * [[wlLabels]]'s scaladoc names: a graph's signature is the sorted
    * multiset of its round-R node labels, hashed to one md5. Two
    * graphs share a signature iff 1-WL cannot distinguish them at
    * depth R (isomorphic ⇒ equal; the standard near-complete test —
    * the known blind spots are the regular-graph families 1-WL can't
    * separate, e.g. C6 vs 2×C3, which is why callers dedup on the
    * signature and verify matches if exactness matters).
    *
    * Implementation: the DISJOINT-UNION trick — WL refinement never
    * crosses connected components, so scoping every node id by its
    * graph ('<graph_id>:<node>') lets ONE [[wlLabels]] run refine the
    * whole family simultaneously: O(rounds) joins total, not per
    * graph. The signature is then one hash aggregation per graph over
    * its node labels (per-graph state is the graph's own label list —
    * graphs here are RECORDS (parse trees, site link graphs, schema
    * graphs), so the collect is record-bounded, the q321 fixture
    * convention; a corpus of graphs fans out across the cluster).
    *
    * Determinism: md5-hex labels sort identically in any engine
    * (binary == lexicographic on [0-9a-f]), so a DuckDB oracle
    * restates every round AND the final sorted-concat hash verbatim.
    *
    * @param graphs one row per edge: (gCol, srcCol, dstCol); node ids
    *               are scoped per graph (the same id in two graphs is
    *               two nodes). gCol's STRING form must not contain
    *               ':' (the scoping separator). Isolated nodes are
    *               invisible (edge-list representation).
    * @return (graph_id string, n_nodes, wl_signature md5 hex) */
  def wlGraphSignature(graphs: DataFrame, gCol: String, srcCol: String,
      dstCol: String, rounds: Int): DataFrame =
    scopedLabels(graphs, gCol, srcCol, dstCol, rounds)
      .groupBy(col("graph_id"))
      .agg(count(lit(1)).as("n_nodes"),
        md5(concat_ws(",", sort_array(collect_list(col("wl_label")))))
          .as("wl_signature"))

  /** [[wlGraphSignature]] for UNBOUNDED graphs — the ORDER-FREE
    * signature: instead of md5 over the per-graph SORTED label list
    * (a collect that breaks on one giant graph — the scaladoc's own
    * site-link-graph example), the signature is a pair of commutative
    * modular sums of each node's md5-60 label value:
    *
    *   sig_pK = ( Σ_nodes (h60(wl_label) mod P_K) ) mod P_K
    *
    * with P_1 = 1e9+7, P_2 = 998244353. Sums are order-free, so the
    * aggregation is a plain map-side-combinable hash agg — per-graph
    * state is TWO BIGINTs regardless of graph size, and the BIGINT
    * partial sum cannot overflow below ~9.2e9 nodes per PARTIAL
    * (Long.Max / P_1), far past any real partition.
    *
    * Collision trade vs the sorted-md5 form: the sorted-concat hash
    * collides only if md5 collides; a modular-sum signature can
    * collide when two different label MULTISETS share both residue
    * sums — probability ~1/(P_1·P_2) ≈ 2⁻⁶⁰ per pair under a uniform
    * hash model (the two residues of one 60-bit value are CRT-
    * independent since P_1·P_2 > 2⁶⁰). Same discipline as SimHash vs
    * exact compare: dedup on the signature, verify matches if
    * exactness matters. Isomorphic graphs STILL collide by
    * construction (equal label multisets ⇒ equal sums), so recall is
    * identical to [[wlGraphSignature]] — only false-merge risk
    * differs.
    *
    * Determinism: h60 is the house md5-60 (conv of the first 15 hex
    * chars), mod and sum are exact BIGINT — any engine restates the
    * signature bit-for-bit.
    *
    * @return (graph_id string, n_nodes, sig_p1, sig_p2) */
  def wlGraphSignatureOrderFree(graphs: DataFrame, gCol: String,
      srcCol: String, dstCol: String, rounds: Int): DataFrame = {
    val h60 = conv(substring(col("wl_label"), 1, 15), 16, 10)
      .cast("long")
    scopedLabels(graphs, gCol, srcCol, dstCol, rounds)
      .select(col("graph_id"), h60.as("__h"))
      .groupBy(col("graph_id"))
      .agg(count(lit(1)).as("n_nodes"),
        (sum(col("__h") % lit(1000000007L)) % lit(1000000007L))
          .as("sig_p1"),
        (sum(col("__h") % lit(998244353L)) % lit(998244353L))
          .as("sig_p2"))
  }

  /** Shared disjoint-union scoping + refinement for the two signature
    * forms: scope every node id by its graph ('<graph_id>:<node>'),
    * run ONE [[wlLabels]] refinement over the whole family, and
    * un-scope. Graph ids containing ':' (the scoping separator) would
    * silently truncate at the un-scoping substring_index and mis-group
    * labels — rejected loudly per row (the funnelSteps convention)
    * via raise_error, which costs nothing on clean data. */
  private def scopedLabels(graphs: DataFrame, gCol: String,
      srcCol: String, dstCol: String, rounds: Int): DataFrame = {
    val gid = col(gCol).cast("string")
    val safeGid = when(gid.contains(":"), raise_error(concat(
        lit("wlGraphSignature: graph id contains ':' " +
          "(the scoping separator): "), gid)))
      .otherwise(gid)
    val scoped = graphs.select(
      concat(safeGid, lit(":"), col(srcCol).cast("string")).as("src"),
      concat(safeGid, lit(":"), col(dstCol).cast("string")).as("dst"))
    wlLabels(scoped, rounds)
      .select(substring_index(col("node"), ":", 1).as("graph_id"),
        col("wl_label"))
  }
}
