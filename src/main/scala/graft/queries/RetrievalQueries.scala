package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.Fusion

/** Post-retrieval list operations (rank fusion, diversified
  * selection) — [[graft.ops.Fusion]] driven end-to-end with DuckDB
  * restatements. Separate module so the retrieval stack's eval
  * (q157 MRR/NDCG in CorpusQueries) and its list ops live behind one
  * obvious seam.
  */
object RetrievalQueries extends QueryModule {

  val queries: Seq[Q] = Seq(
    // ---- reciprocal-rank fusion of two heterogeneous per-source
    // document rankings (ops/Fusion.rrfFuse): run A = longest-first,
    // run B = a hash ordering (deterministic stand-ins for BM25 vs
    // embedding retrievers — the op only consumes ranks). The
    // reciprocal is the INTEGER division 1e9 div (60 + rank), so
    // rrf_ppb is exact BIGINT and fusion order replays in any engine;
    // docs in both runs must outrank equal-rank singletons. Both runs
    // truncate at 10, so the fused window partition is shortlist-
    // sized at any corpus size.
    Q(
      "q315_rrf_fusion",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val wA = Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)
        val runA = docs.withColumn("rank", row_number().over(wA))
          .filter(col("rank") <= 10)
          .select(col("source"), col("doc_id"), col("rank"))
        val wB = Window.partitionBy(col("source"))
          .orderBy(((col("doc_id") * lit(2654435761L)) % lit(1000000007L))
            .asc, col("doc_id").asc)
        val runB = docs.withColumn("rank", row_number().over(wB))
          .filter(col("rank") <= 10)
          .select(col("source"), col("doc_id"), col("rank"))
        Fusion.rrfFuse(runA.unionAll(runB), "source", "doc_id", "rank")
          .select(col("query").as("source"), col("doc").as("doc_id"),
            col("n_runs"), col("rrf_ppb"), col("fused_rank"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, source, n_chars FROM documents
             |), runA AS (
             |  SELECT source, doc_id, rank FROM (
             |    SELECT source, doc_id, CAST(row_number() OVER (
             |      PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rank
             |    FROM docs) WHERE rank <= 10
             |), runB AS (
             |  SELECT source, doc_id, rank FROM (
             |    SELECT source, doc_id, CAST(row_number() OVER (
             |      PARTITION BY source
             |      ORDER BY (doc_id * 2654435761) % 1000000007 ASC,
             |        doc_id ASC) AS BIGINT) AS rank
             |    FROM docs) WHERE rank <= 10
             |), runs AS (
             |  SELECT * FROM runA UNION ALL SELECT * FROM runB
             |), fused AS (
             |  SELECT source, doc_id,
             |    CAST(count(*) AS BIGINT) AS n_runs,
             |    CAST(sum(1000000000 // (60 + rank)) AS BIGINT)
             |      AS rrf_ppb
             |  FROM runs GROUP BY 1, 2
             |)
             |SELECT source, doc_id, n_runs, rrf_ppb,
             |  CAST(row_number() OVER (PARTITION BY source
             |    ORDER BY rrf_ppb DESC, doc_id ASC) AS INT)
             |    AS fused_rank
             |FROM fused""".stripMargin),
    ),

    // ---- MMR diversified top-3 per source (ops/Fusion.mmrSelect):
    // relevance = n_chars, similarity = distinct-unigram Jaccard in
    // integer micros between the top-6 longest docs of each source —
    // the de-duplicating selection before packing passages into a
    // context window. Greedy objective λ·rel − (1−λ)·maxSim is pure
    // BIGINT (λ = 700 pm), ties to the smaller doc id; the oracle
    // unrolls the three selection steps (the q251 unrolled-rounds
    // convention), so a wrong sim, a wrong tie-break, or a stale
    // max-over-selected all mismatch.
    Q(
      "q316_mmr_diversify",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"),
            array_distinct(split(trim(col("text")), "\\s+")).as("toks"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)
        val qidExpr = expr(
          "CAST(conv(substring(md5(source), 1, 15), 16, 10) AS BIGINT)")
        val cands = docs.withColumn("__r", row_number().over(w))
          .filter(col("__r") <= 6)
          .withColumn("qid", qidExpr)
        val sims = cands.as("a").join(cands.as("b"),
            col("a.source") === col("b.source")
              && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.qid").as("qid"),
            col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            expr("""(1000000 * size(array_intersect(a.toks, b.toks)))
                   |  div size(array_distinct(
                   |    concat(a.toks, b.toks)))""".stripMargin)
              .as("sim_micro"))
        Fusion.mmrSelect(
          cands.select(col("qid"), col("doc_id").as("doc"),
            col("n_chars").as("rel_micro")),
          sims, k = 3, lambdaPermille = 700)
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, source, n_chars,
             |    list_distinct(string_split(trim(text), ' ')) AS toks,
             |    CAST('0x' || substr(md5(source), 1, 15) AS BIGINT)
             |      AS qid
             |  FROM documents
             |), cands AS (
             |  SELECT qid, doc_id AS doc, n_chars AS rel, toks FROM (
             |    SELECT *, row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id ASC) AS r
             |    FROM docs) WHERE r <= 6
             |), sims AS (
             |  SELECT a.qid, a.doc AS da, b.doc AS db,
             |    CAST((1000000 * len(list_intersect(a.toks, b.toks)))
             |      // len(list_distinct(list_concat(a.toks, b.toks)))
             |      AS BIGINT) AS sim
             |  FROM cands a JOIN cands b
             |    ON a.qid = b.qid AND a.doc < b.doc
             |), s1 AS (
             |  SELECT qid, doc, 700 * rel AS obj FROM (
             |    SELECT qid, doc, rel, row_number() OVER (
             |      PARTITION BY qid
             |      ORDER BY 700 * rel DESC, doc ASC) AS rn
             |    FROM cands) WHERE rn = 1
             |), o2 AS (
             |  SELECT c.qid, c.doc,
             |    700 * c.rel - 300 * coalesce(s.sim, 0) AS obj
             |  FROM cands c
             |  JOIN s1 ON c.qid = s1.qid AND c.doc <> s1.doc
             |  LEFT JOIN sims s ON s.qid = c.qid
             |    AND least(c.doc, s1.doc) = s.da
             |    AND greatest(c.doc, s1.doc) = s.db
             |), s2 AS (
             |  SELECT qid, doc, obj FROM (
             |    SELECT *, row_number() OVER (PARTITION BY qid
             |      ORDER BY obj DESC, doc ASC) AS rn
             |    FROM o2) WHERE rn = 1
             |), o3 AS (
             |  SELECT c.qid, c.doc,
             |    700 * c.rel - 300 * greatest(
             |      coalesce(sa.sim, 0), coalesce(sb.sim, 0)) AS obj
             |  FROM cands c
             |  JOIN s1 ON c.qid = s1.qid
             |  JOIN s2 ON c.qid = s2.qid
             |  LEFT JOIN sims sa ON sa.qid = c.qid
             |    AND least(c.doc, s1.doc) = sa.da
             |    AND greatest(c.doc, s1.doc) = sa.db
             |  LEFT JOIN sims sb ON sb.qid = c.qid
             |    AND least(c.doc, s2.doc) = sb.da
             |    AND greatest(c.doc, s2.doc) = sb.db
             |  WHERE c.doc <> s1.doc AND c.doc <> s2.doc
             |), s3 AS (
             |  SELECT qid, doc, obj FROM (
             |    SELECT *, row_number() OVER (PARTITION BY qid
             |      ORDER BY obj DESC, doc ASC) AS rn
             |    FROM o3) WHERE rn = 1
             |)
             |SELECT qid, doc, 1 AS mmr_rank, CAST(obj AS BIGINT) AS obj
             |FROM s1
             |UNION ALL
             |SELECT qid, doc, 2, CAST(obj AS BIGINT) FROM s2
             |UNION ALL
             |SELECT qid, doc, 3, CAST(obj AS BIGINT) FROM s3""".stripMargin),
    ),

    // ---- end-to-end MMR over embeddings (ops/Fusion
    // .mmrDiversifyEmbeddings): the RAG-packing path as ONE call —
    // exact top-6 cosine shortlist per query vector (every 100th
    // vec_id), relevance = floored micro-cosine, redundancy = exact
    // pairwise micro-cosines within each shortlist, greedy λ=0.7
    // top-3 — no hand-staged sims anywhere (the r9 brief's gap).
    // Cosine is the house sequential fold, bit-identical to DuckDB's
    // list_sum, so the oracle restates the shortlist, both cosine
    // floors, and all three unrolled selection steps exactly.
    Q(
      "q324_mmr_embeddings_e2e",
      (s, d) => graft.ops.Fusion.mmrDiversifyEmbeddings(
        Tables.embeddings(s, d), "vec_id", "embedding",
        col("vec_id") % 100 === 0, shortlistN = 6, k = 3,
        lambdaPermille = 700),
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings
             |), q AS (
             |  SELECT vec_id, v FROM e WHERE vec_id % 100 = 0
             |), p AS (
             |  SELECT q.vec_id AS qid, b.vec_id AS doc,
             |    list_sum(list_transform(list_zip(q.v, b.v),
             |      p -> p[1] * p[2])) /
             |      (sqrt(list_sum(list_transform(q.v, x -> x * x))) *
             |       sqrt(list_sum(list_transform(b.v, x -> x * x))))
             |      AS cosine
             |  FROM q JOIN e b ON b.vec_id <> q.vec_id
             |), cands AS (
             |  SELECT qid, doc,
             |    CAST(floor(1000000 * cosine) AS BIGINT) AS rel FROM (
             |    SELECT *, row_number() OVER (PARTITION BY qid
             |      ORDER BY cosine DESC, doc ASC) AS r
             |    FROM p) WHERE r <= 6
             |), sims AS (
             |  SELECT a.qid, a.doc AS da, b.doc AS db,
             |    CAST(floor(1000000 * (
             |      list_sum(list_transform(list_zip(va.v, vb.v),
             |        p -> p[1] * p[2])) /
             |        (sqrt(list_sum(list_transform(va.v, x -> x * x))) *
             |         sqrt(list_sum(list_transform(vb.v, x -> x * x))))))
             |      AS BIGINT) AS sim
             |  FROM cands a JOIN cands b
             |    ON a.qid = b.qid AND a.doc < b.doc
             |  JOIN e va ON va.vec_id = a.doc
             |  JOIN e vb ON vb.vec_id = b.doc
             |), s1 AS (
             |  SELECT qid, doc, 700 * rel AS obj FROM (
             |    SELECT qid, doc, rel, row_number() OVER (
             |      PARTITION BY qid
             |      ORDER BY 700 * rel DESC, doc ASC) AS rn
             |    FROM cands) WHERE rn = 1
             |), o2 AS (
             |  SELECT c.qid, c.doc,
             |    700 * c.rel - 300 * coalesce(s.sim, 0) AS obj
             |  FROM cands c
             |  JOIN s1 ON c.qid = s1.qid AND c.doc <> s1.doc
             |  LEFT JOIN sims s ON s.qid = c.qid
             |    AND least(c.doc, s1.doc) = s.da
             |    AND greatest(c.doc, s1.doc) = s.db
             |), s2 AS (
             |  SELECT qid, doc, obj FROM (
             |    SELECT *, row_number() OVER (PARTITION BY qid
             |      ORDER BY obj DESC, doc ASC) AS rn
             |    FROM o2) WHERE rn = 1
             |), o3 AS (
             |  SELECT c.qid, c.doc,
             |    700 * c.rel - 300 * greatest(
             |      coalesce(sa.sim, 0), coalesce(sb.sim, 0)) AS obj
             |  FROM cands c
             |  JOIN s1 ON c.qid = s1.qid
             |  JOIN s2 ON c.qid = s2.qid
             |  LEFT JOIN sims sa ON sa.qid = c.qid
             |    AND least(c.doc, s1.doc) = sa.da
             |    AND greatest(c.doc, s1.doc) = sa.db
             |  LEFT JOIN sims sb ON sb.qid = c.qid
             |    AND least(c.doc, s2.doc) = sb.da
             |    AND greatest(c.doc, s2.doc) = sb.db
             |  WHERE c.doc <> s1.doc AND c.doc <> s2.doc
             |), s3 AS (
             |  SELECT qid, doc, obj FROM (
             |    SELECT *, row_number() OVER (PARTITION BY qid
             |      ORDER BY obj DESC, doc ASC) AS rn
             |    FROM o3) WHERE rn = 1
             |)
             |SELECT qid, doc, 1 AS mmr_rank, CAST(obj AS BIGINT) AS obj
             |FROM s1
             |UNION ALL
             |SELECT qid, doc, 2, CAST(obj AS BIGINT) FROM s2
             |UNION ALL
             |SELECT qid, doc, 3, CAST(obj AS BIGINT) FROM s3""".stripMargin),
    ),
  )
}
