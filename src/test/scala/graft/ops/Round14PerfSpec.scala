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
