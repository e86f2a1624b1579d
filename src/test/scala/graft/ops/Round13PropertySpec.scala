package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 differentials: the persisted prefix index must reproduce
  * the fresh-union recall-exact cross path exactly (any consistent
  * total gram order is lossless — the frozen first-sight-df order is
  * merely a DIFFERENT one), and the mergeable span-gram state must
  * reproduce full-corpus duplicate coverage when accumulated over all
  * batches.
  */
class Round13PropertySpec extends SparkSpec {

  private def docs: DataFrame = graft.model.Tables
    .documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), col("text"))

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2))).toSet

  test("indexed cross-corpus prefix path equals the fresh-union path — " +
      "built whole, built-then-merged, and merged in either order") {
    val newSide = docs.filter(col("doc_id") % 3 === 0)
    val oldSide = docs.filter(col("doc_id") % 3 =!= 0)
    val b1 = docs.filter(col("doc_id") % 3 === 1)
    val b2 = docs.filter(col("doc_id") % 3 === 2)
    val fresh = pairs(Dedup.crossCorpusPrefixFilterPairs(newSide,
      oldSide, "doc_id", "text", n = 3, tau = 0.5))
    assert(fresh.nonEmpty) // the fixture corpus has planted near-dups
    // index built over the whole old side in one pass
    val whole = Dedup.indexCorpusPrefix(oldSide, "doc_id", "text",
      n = 3, tau = 0.5)
    assert(pairs(Dedup.crossCorpusPrefixFilterPairsIndexed(
      newSide, whole, "text")) == fresh)
    // built on batch 1, batch 2 folded in through the mergeable
    // update (novel grams enter the frozen order at df = 0 — a
    // genuinely different order than the fresh union's)
    val merged12 = Dedup.mergePrefixIndex(
      Dedup.indexCorpusPrefix(b1, "doc_id", "text", n = 3, tau = 0.5),
      b2, "text")
    assert(pairs(Dedup.crossCorpusPrefixFilterPairsIndexed(
      newSide, merged12, "text")) == fresh)
    // ...and in the opposite fold order: the frozen dfs differ again,
    // the exact-verified output must not
    val merged21 = Dedup.mergePrefixIndex(
      Dedup.indexCorpusPrefix(b2, "doc_id", "text", n = 3, tau = 0.5),
      b1, "text")
    assert(pairs(Dedup.crossCorpusPrefixFilterPairsIndexed(
      newSide, merged21, "text")) == fresh)
    // chained DOUBLE merge: the second merge's novel grams land in
    // df = 0 collision groups that already hold the first merge's
    // novel grams — the cx recompute must keep the relative order of
    // existing members (by gram text) so prefixes persisted after
    // merge 1 stay valid through merge 2
    val b2a = b2.filter(col("doc_id") % 2 === 0)
    val b2b = b2.filter(col("doc_id") % 2 =!= 0)
    val chained = Dedup.mergePrefixIndex(
      Dedup.mergePrefixIndex(
        Dedup.indexCorpusPrefix(b1, "doc_id", "text", n = 3, tau = 0.5),
        b2a, "text"),
      b2b, "text")
    assert(pairs(Dedup.crossCorpusPrefixFilterPairsIndexed(
      newSide, chained, "text")) == fresh)
  }

  test("span-gram state: fold order irrelevant; accumulated state " +
      "reproduces the full-corpus bar and coverage exactly") {
    val b = (0 to 2).map(k => docs.filter(col("doc_id") % 3 === k))
    val states = b.map(Dedup.spanGramState(_, "doc_id", "text", l = 12))
    def asMap(df: DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s012 = Dedup.mergeSpanGramState(
      Dedup.mergeSpanGramState(states(0), states(1)), states(2))
    val s210 = Dedup.mergeSpanGramState(states(2),
      Dedup.mergeSpanGramState(states(1), states(0)))
    val folded = asMap(s012.df)
    assert(folded == asMap(s210.df))
    // merged batch states == the single-pass full-corpus state
    assert(folded == asMap(
      Dedup.spanGramState(docs, "doc_id", "text", l = 12).df))
    assert(folded.nonEmpty)

    def rows(df: DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    // replay differential: batch coverage against the accumulated
    // state equals full-corpus coverage restricted to the batch
    val incremental = rows(Dedup.duplicateCoverageAgainst(b(2), s012,
      "doc_id", "text"))
    val fullRestricted = rows(Dedup.duplicateCoverage(docs,
        "doc_id", "text", l = 12)
      .filter(col("doc_id") % 3 === 2))
    assert(incremental == fullRestricted)
    assert(incremental.nonEmpty)
    // self-state identity: spans against your own state ARE
    // duplicateSpans (the non-incremental operator delegates to the
    // same bar + merge)
    val selfState = Dedup.spanGramState(docs, "doc_id", "text", l = 12)
    assert(rows(Dedup.duplicateSpansAgainst(docs, selfState,
        "doc_id", "text")) ==
      rows(Dedup.duplicateSpans(docs, "doc_id", "text", l = 12)))
  }

  test("blockedPairCtesAt: the house fragment is its (0.5, 3) " +
      "instantiation; other parameters change exactly the gram width " +
      "and thresholds") {
    import graft.queries.OracleSql
    assert(OracleSql.blockedPairCtes == OracleSql.blockedPairCtesAt("0.5", 3))
    val alt = OracleSql.blockedPairCtesAt("0.7", 2)
    assert(alt.contains("[w[i] || ' ' || w[i+1] for i in range(1, len(w))]"))
    assert(!alt.contains("w[i+2]"))
    assert(alt.contains("ceil(0.7 * len(ot))"))
    assert(alt.contains(">= 0.7"))
    assert(!alt.contains("0.5"))
  }
}
