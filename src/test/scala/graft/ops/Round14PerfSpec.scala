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

  test("dedupAndMergePrefixIndexDir (append-structured publish) equals " +
      "write(merge(read)): same pairs, row-identical directory, same " +
      "next-batch behavior after a second dir merge") {
    val docs = graft.model.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val oldSide = docs.filter(col("doc_id") % 3 =!= 0)
    val batch1 = docs.filter(col("doc_id") % 6 === 0)
    val batch2 = docs.filter(col("doc_id") % 6 === 3)
    val built = Dedup.indexCorpusPrefix(oldSide, "doc_id", "text",
      n = 3, tau = 0.5)
    val dirA = graft.io.Scratch.dir("graft-r14-dirmerge-a-")  + "/idx"
    val dirB = graft.io.Scratch.dir("graft-r14-dirmerge-b-") + "/idx"
    Dedup.writePrefixIndex(built, dirA)
    Dedup.writePrefixIndex(built, dirB)

    // reference path: read -> separate dedup + merge -> full rewrite
    val refIdx = Dedup.readPrefixIndex(spark, dirB)
    val refPairs = rows(Dedup.crossCorpusPrefixFilterPairsIndexed(
      batch1, refIdx, "text"))
    Dedup.writePrefixIndex(
      Dedup.mergePrefixIndex(refIdx, batch1, "text"), dirB)

    val dirPairs = rows(Dedup.dedupAndMergePrefixIndexDir(
      spark, dirA, batch1, "text"))
    assert(dirPairs == refPairs, "tick-1 pair set diverged")
    assert(dirPairs.nonEmpty)

    // the two directories must hold row-identical frames
    val a = Dedup.readPrefixIndex(spark, dirA)
    val b = Dedup.readPrefixIndex(spark, dirB)
    assert(rows(a.vocab) == rows(b.vocab), "vocab diverged")
    assert(rows(a.grams) == rows(b.grams), "grams diverged")
    assert(rows(a.prefixes) == rows(b.prefixes), "prefixes diverged")
    assert((a.idCol, a.n, a.tau) == (b.idCol, b.n, b.tau))

    // and answer the NEXT batch identically through ANOTHER dir merge
    val tick2A = rows(Dedup.dedupAndMergePrefixIndexDir(
      spark, dirA, batch2, "text"))
    val tick2B = rows(Dedup.crossCorpusPrefixFilterPairsIndexed(
      batch2, Dedup.readPrefixIndex(spark, dirB), "text"))
    assert(tick2A == tick2B, "tick-2 pair set diverged")
    assert(tick2A.nonEmpty)
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
