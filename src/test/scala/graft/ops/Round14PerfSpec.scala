package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 OPTIMIZATION differentials: every rewrite that changes an
  * operator's internals for speed is pinned here against the
  * implementation it replaced (or a from-first-principles restatement),
  * asserting BIT-EQUAL output — the optimization rounds' contract is
  * "same results, less work".
  */
class Round14PerfSpec extends SparkSpec {

  private def embeddings: DataFrame = graft.model.Tables
    .embeddings(spark, "/root/testdata/sf0.001")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("dedupAndMergePrefixIndex equals the separate indexed-dedup + " +
      "merge calls: same pair set, same merged-index query behavior") {
    val docs = graft.model.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val oldSide = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 6 === 0)
    val probe = docs.filter(col("doc_id") % 6 === 3)
    val idx = Dedup.indexCorpusPrefix(oldSide, "doc_id", "text",
      n = 3, tau = 0.5)

    val sepPairs = rows(Dedup.crossCorpusPrefixFilterPairsIndexed(
      batch, idx, "text"))
    val sepMerged = Dedup.mergePrefixIndex(idx, batch, "text")

    val (fusedPairs, fusedMerged) =
      Dedup.dedupAndMergePrefixIndex(batch, idx, "text")
    assert(rows(fusedPairs) == sepPairs, "pair set diverged")
    assert(sepPairs.nonEmpty)

    // the merged indexes must behave identically for the NEXT batch
    val viaSep = rows(Dedup.crossCorpusPrefixFilterPairsIndexed(
      probe, sepMerged, "text"))
    val viaFused = rows(Dedup.crossCorpusPrefixFilterPairsIndexed(
      probe, fusedMerged, "text"))
    assert(viaSep == viaFused, "merged-index behavior diverged")
    assert(viaSep.nonEmpty)
  }

  test("labelNeighborsBothKernel side-filtered equals the single-sided " +
      "kernels bit-for-bit (cosines, ids, ranks), k=1 and k=3") {
    val emb = embeddings
    for (k <- Seq(1, 3)) {
      val both = Similarity.labelNeighborsBothKernel(emb, "vec_id",
        "embedding", "label", k = k)
      val pos = Similarity.nearestPositivesKernel(emb, "vec_id",
        "embedding", "label", k = k)
      val neg = Similarity.hardNegativesKernel(emb, "vec_id",
        "embedding", "label", k = k)
      val cols = Seq("id", "neighbor_id", "cosine", "rank").map(col)
      assert(rows(both.filter(col("same_label")).select(cols: _*)) ==
        rows(pos.select(cols: _*)), s"positives diverged at k=$k")
      assert(rows(both.filter(!col("same_label")).select(cols: _*)) ==
        rows(neg.select(cols: _*)), s"negatives diverged at k=$k")
    }
  }
}
