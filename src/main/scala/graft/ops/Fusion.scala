package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion and diversified selection — the two standard post-
  * retrieval list operations next to the MRR/NDCG eval in
  * [[Scoring.retrievalMetrics]]:
  *
  *  - RRF combines rankings from heterogeneous retrievers (BM25 +
  *    embedding + freshness…) without score calibration — only ranks
  *    matter, which is why it wins in practice over weighted-score
  *    mixing across incomparable scales (Cormack, Clarke & Büttcher
  *    2009, "Reciprocal Rank Fusion outperforms Condorcet and
  *    individual rank learning methods", SIGIR).
  *  - MMR re-orders a relevance shortlist to penalize redundancy —
  *    the de-duplicating selection step before showing k results or
  *    packing k passages into a RAG context (Carbonell & Goldstein
  *    1998, "The use of MMR, diversity-based reranking", SIGIR).
  *
  * Both stay in the house integer-exact discipline: RRF's reciprocal
  * is the INTEGER division 1e9 div (k + rank) (identical in any
  * engine — no float reciprocal at all), and MMR's greedy objective
  * is a pure BIGINT expression over integer relevance/similarity, so
  * every selection and tie-break is replayable bit-for-bit.
  */
object Fusion {

  /** Reciprocal-rank fusion over one or more runs' rankings.
    *
    * Scale shape: one hash aggregation on (query, doc) — map-side
    * combinable — then a per-query rank window; per-query candidate
    * volume is bounded by runs × per-run depth (the caller's run
    * construction truncates each run, so the window partition is
    * shortlist-sized at any corpus size).
    *
    * @param runs one row per (query, doc, rank) per run; rank is the
    *             run's own 1-based position
    * @param k    the RRF smoothing constant (60 in the paper — small k
    *             overweights top ranks)
    * @return (query, doc, n_runs, rrf_ppb, fused_rank): rrf_ppb =
    *         Σ_runs 1e9 div (k + rank) — exact BIGINT; fused rank
    *         breaks score ties by doc ascending */
  def rrfFuse(runs: DataFrame, queryCol: String, docCol: String,
      rankCol: String, k: Int = 60): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    val fused = runs
      .select(col(queryCol).as("query"), // any key type — kept verbatim
        col(docCol).cast("long").as("doc"),
        col(rankCol).cast("long").as("__r"))
      .groupBy(col("query"), col("doc"))
      .agg(count(lit(1)).as("n_runs"),
        sum(expr(s"1000000000 div ($k + __r)")).as("rrf_ppb"))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("rrf_ppb").desc, col("doc").asc)
    fused.withColumn("fused_rank", row_number().over(w).cast("int"))
  }

  /** Maximal-marginal-relevance greedy selection of `k` items per
    * query from an integer-scored shortlist:
    *
    *   next = argmax over remaining d of
    *     λpm · rel(d) − (1000 − λpm) · max_{s ∈ selected} sim(d, s)
    *
    * (first pick has no sim term; ties break to the smaller doc id —
    * every quantity BIGINT, so the selection sequence is deterministic
    * and any engine replaying the definition agrees).
    *
    * Scale shape: candidates and their pairwise sims group per query
    * into ONE task over in-memory arrays (the IVF member-pack
    * convention) — per-query state is shortlist-bounded (the caller's
    * top-N construction, typically ≤ a few hundred: N² sims ≈ 10⁴
    * longs), queries fan out across the cluster, and the greedy k·N
    * scan is arithmetic on longs. Never corpus-sized: MMR is defined
    * on a shortlist; diversifying a full corpus is the clustering
    * problem, not this operator.
    *
    * @param cands (qid, doc, rel_micro) — docs unique per qid
    * @param sims  (qid, doc_a, doc_b, sim_micro) — symmetric pairs in
    *              either order; ABSENT pairs count as sim 0
    * @param lambdaPermille λ in integer per-mille (700 = 0.7)
    * @return (qid, doc, mmr_rank 1..k, obj) with obj the exact
    *         selection-time objective (per-mille · micro units) */
  def mmrSelect(cands: DataFrame, sims: DataFrame, k: Int,
      lambdaPermille: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaPermille >= 0 && lambdaPermille <= 1000,
      s"lambdaPermille must be in [0, 1000], got $lambdaPermille")
    val spark = cands.sparkSession
    import spark.implicits._
    val c = cands
      .select(col("qid").cast("long"), col("doc").cast("long"),
        col("rel_micro").cast("long"))
      .groupBy(col("qid"))
      .agg(sort_array(collect_list(struct(col("doc").as("_1"),
        col("rel_micro").as("_2")))).as("cs"))
    val sp = sims
      .select(col("qid").cast("long"), col("doc_a").cast("long"),
        col("doc_b").cast("long"), col("sim_micro").cast("long"))
      .groupBy(col("qid"))
      .agg(collect_list(struct(col("doc_a").as("_1"),
        col("doc_b").as("_2"), col("sim_micro").as("_3"))).as("ss"))
    val lam = lambdaPermille.toLong
    c.join(sp, Seq("qid"), "left")
      .as[(Long, Seq[(Long, Long)], Option[Seq[(Long, Long, Long)]])]
      .flatMap { case (qid, cs, ssOpt) =>
        val sim = scala.collection.mutable.HashMap
          .empty[(Long, Long), Long]
        ssOpt.getOrElse(Nil).foreach { case (a, b, s) =>
          sim((math.min(a, b), math.max(a, b))) = s
        }
        def simOf(a: Long, b: Long): Long =
          sim.getOrElse((math.min(a, b), math.max(a, b)), 0L)
        val rel = cs.toMap
        val remaining =
          scala.collection.mutable.LinkedHashSet(cs.map(_._1): _*)
        var selected = List.empty[Long]
        (1 to math.min(k, cs.size)).iterator.map { rank =>
          val (obj, doc) = remaining.iterator.map { d =>
            val maxSim =
              if (selected.isEmpty) 0L
              else selected.iterator.map(simOf(d, _)).max
            (lam * rel(d) - (1000L - lam) * maxSim, d)
          }.maxBy { case (o, d) => (o, -d) } // obj desc, doc asc
          remaining -= doc
          selected ::= doc
          (qid, doc, rank, obj)
        }.toList
      }
      .toDF("qid", "doc", "mmr_rank", "obj")
  }

  /** END-TO-END MMR over an embedding table — the RAG-packing path as
    * ONE call (r9 brief: no hand-staged sims): for every query vector
    * (rows matching `queryPred`), (1) shortlist = its exact top-N
    * cosine neighbors via [[Similarity.cosineTopKKernelForQueries]]'s
    * blocked kernel, (2) relevance = that query–candidate cosine
    * floored to integer micros, (3) redundancy = exact pairwise
    * cosines WITHIN each query's shortlist (N²-bounded per query,
    * never corpus²), (4) [[mmrSelect]] greedily picks `k` diversified
    * results.
    *
    * Scale shape: the kernel is the only corpus-sized stage (B²
    * block-pair tasks); everything after is shortlist-bounded —
    * per-query N² pairs fetch their vectors through two hash joins on
    * id and the greedy scan runs on ≤ N²/2 longs per query. Cosine
    * stays the house sequential-fold double ([[Similarity.cosine]] —
    * bit-identical to DuckDB's list_sum), so the floored micros and
    * every selection replay exactly in the oracle.
    *
    * @param queryPred which rows are queries (e.g. `vec_id % 100 === 0`)
    * @param shortlistN per-query candidate pool (≤ a few hundred)
    * @return (qid, doc, mmr_rank 1..k, obj) as [[mmrSelect]] */
  def mmrDiversifyEmbeddings(emb: DataFrame, idCol: String,
      vecCol: String, queryPred: Column, shortlistN: Int, k: Int,
      lambdaPermille: Int): DataFrame =
    mmrDiversifyEmbeddings(emb, idCol, vecCol, queryPred, shortlistN,
      k, lambdaPermille, VecsBroadcastCeilingBytes)

  /** Conservative ceiling for broadcasting the pruned id+vector frame:
    * far under Spark's hard 8 GB broadcast limit AND under typical
    * driver/executor headroom, because the broadcast is built on the
    * driver and replicated to every executor. */
  private[graft] val VecsBroadcastCeilingBytes: Long = 512L << 20

  /** Estimated in-memory bytes of the pruned vecs frame: one BIGINT id
    * plus an array<double> of `dim` elements per row (24 B covers the
    * id + array header + per-row overhead). Exactness is not the point
    * — the gate only needs the right order of magnitude: 2 M ids at
    * dim 768 estimates ~12 GB and must NOT broadcast. */
  private[graft] def vecsBroadcastBytes(idCount: Long, dim: Long): Long =
    idCount * (dim * 8L + 24L)

  /** Embedding width for the byte gate: the EXACT max over the pruned
    * frame. r12 ADVICE closed the null-first-row collapse (a head(1)
    * row with a NULL embedding read size() = -1 and the byte estimate
    * fell to 16 B/row); the r13 review closed the residual
    * heterogeneous-width hole — a SAMPLE whose first rows are narrow
    * (128-dim summaries) ahead of wide rows (4096-dim) under-sizes
    * the broadcast the same way. The frame is already materialized
    * and shortlist-bounded, so one max aggregation (map-side partial,
    * no shuffle of the vectors themselves) is cheap insurance against
    * the catastrophic failure the gate exists for. Returns 0 when
    * nothing measurable (empty / all-null) — the caller treats that
    * as DO-NOT-BROADCAST. */
  private[graft] def sampledDim(vecs: DataFrame, vecCol: String): Long = {
    val row = vecs.agg(max(size(col(vecCol))).cast("long").as("__d")).head()
    if (row.isNullAt(0)) 0L else math.max(0L, row.getLong(0))
  }

  private[graft] def mmrDiversifyEmbeddings(emb: DataFrame, idCol: String,
      vecCol: String, queryPred: Column, shortlistN: Int, k: Int,
      lambdaPermille: Int, vecsCeilingBytes: Long): DataFrame = {
    import graft.ops.Materialize.MaterializeOps
    require(shortlistN >= k,
      s"shortlistN ($shortlistN) must be >= k ($k)")
    val shortlist = Similarity.cosineTopKKernelForQueries(
        emb, idCol, vecCol, shortlistN, queryPred)
      .select(col("id").as("qid"), col("neighbor_id").as("doc"),
        col("cosine"))
      .materialized // reused: candidates + both sides of the pair join
    val cands = shortlist.select(col("qid"), col("doc"),
      expr("CAST(floor(1000000 * cosine) AS BIGINT)").as("rel_micro"))
    // the pair fetch must never shuffle the full embedding table for a
    // probe-sized query set (r10 brief): prune vecs to shortlist ids
    // through a semi-join, materialize the survivor set once, and feed
    // both pair joins from it. The broadcasts are ADAPTIVE, not
    // unconditional (r11 review), and the two frames are gated
    // SEPARATELY (r11 verdict): the id frame is bare BIGINTs — a row
    // threshold bounds its bytes (2 M rows ≈ 16 MB) — but the vecs
    // frame carries the full array<double> embedding, so its byte
    // size is rows × dim-dependent: 2 M ids at dim 768 is ~12 GB,
    // inside any sane row threshold yet over Spark's 8 GB broadcast
    // ceiling. vecs is therefore gated on ESTIMATED BYTES, with the
    // width read as an exact max over the already-materialized
    // survivor frame (see sampledDim). Past either gate the joins fall back
    // to shuffles — then the corpus table is exchanged once (the
    // pre-r11 shape, which completes at any size), and every
    // post-prune frame is still shortlist-bounded. Plan-asserted in
    // FusionSpec for both the probe-sized broadcast case and the
    // wide-dim shuffle fallback.
    val ids = shortlist.select(col("doc")).distinct().materialized
    val idCount = ids.count()
    val probeSized = idCount <= 2000000L
    val vecs = emb.select(col(idCol).cast("long").as("doc"),
        col(vecCol).cast("array<double>").as("__v"))
      .join(if (probeSized) broadcast(ids) else ids, Seq("doc"),
        "left_semi")
      .materialized // shortlist-sized; reused by the two pair joins
    val dim = sampledDim(vecs, "__v")
    val vecsSized = probeSized && dim > 0 &&
      vecsBroadcastBytes(idCount, dim) <= vecsCeilingBytes
    def maybeBroadcastVecs(df: DataFrame): DataFrame =
      if (vecsSized) broadcast(df) else df
    val sims = shortlist.select(col("qid"), col("doc").as("doc_a"))
      .join(shortlist.select(col("qid"), col("doc").as("doc_b")), "qid")
      .filter(col("doc_a") < col("doc_b"))
      .join(maybeBroadcastVecs(
        vecs.select(col("doc").as("doc_a"), col("__v").as("__va"))),
        "doc_a")
      .join(maybeBroadcastVecs(
        vecs.select(col("doc").as("doc_b"), col("__v").as("__vb"))),
        "doc_b")
      .select(col("qid"), col("doc_a"), col("doc_b"),
        floor(lit(1000000) * Similarity.cosine(col("__va"), col("__vb")))
          .cast("long").as("sim_micro"))
    mmrSelect(cands, sims, k, lambdaPermille)
  }
}
