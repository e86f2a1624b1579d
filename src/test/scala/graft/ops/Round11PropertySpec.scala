package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property tests for the round-11 operators: the order-free WL
  * graph signature's isomorphism invariance and its grouping agreement
  * with the sorted-md5 form, the ':' graph-id guard, and the
  * duplicate-coverage accounting invariants. Randomized with fixed
  * seeds — deterministic, like Round9/10PropertySpec. */
class Round11PropertySpec extends SparkSpec {
  import spark.implicits._

  test("wlGraphSignatureOrderFree: invariant under random relabeling, " +
      "and groups graphs exactly like the sorted-md5 form") {
    val rnd = new scala.util.Random(111)
    // family: a random 12-node graph G, an isomorphic copy under a
    // random permutation, and a NON-isomorphic variant (one extra
    // edge) — order-free signatures must merge the first two and
    // separate the third, at every depth, exactly as the sorted form
    val edges = (1 to 22).map(_ =>
      (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter { case (a, b) => a != b }.distinct
    val perm = rnd.shuffle((0L to 11L).toVector)
    val iso = edges.map { case (a, b) => (perm(a.toInt), perm(b.toInt)) }
    // graph 3 = graph 1 plus one GUARANTEED-new undirected edge (the
    // first enumerated pair absent from the normalized edge set), so
    // its degree multiset — and hence every signature depth — differs
    val norm = edges.map { case (a, b) =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val newEdge = (for { a <- 0L to 11L; b <- (a + 1) to 11L
      if !norm((a, b)) } yield (a, b)).head
    val extra = edges :+ newEdge
    val df = (edges.map { case (a, b) => (1L, a, b) } ++
      iso.map { case (a, b) => (2L, a, b) } ++
      extra.map { case (a, b) => (3L, a, b) })
      .toDF("graph_id", "src", "dst")
    for (r <- Seq(0, 1, 3)) {
      val free = GraphOps.wlGraphSignatureOrderFree(
          df, "graph_id", "src", "dst", rounds = r).collect()
        .map(x => x.getString(0) ->
          ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
      assert(free("1") == free("2"), s"rounds=$r: iso copies diverged")
      // the extra-edge variant must SEPARATE: its degree multiset
      // differs, so the label multiset differs at every depth
      assert((free("3")._2, free("3")._3) !=
        (free("1")._2, free("1")._3), s"rounds=$r: extra edge merged")
      val sorted = GraphOps.wlGraphSignature(
          df, "graph_id", "src", "dst", rounds = r).collect()
        .map(x => x.getString(0) -> x.getString(2)).toMap
      // grouping agreement: the two forms induce the SAME partition of
      // the family (recall is construction-identical; this family has
      // no engineered sum collision)
      def groups(sig: Map[String, Any]): Set[Set[String]] =
        sig.groupBy(_._2).values.map(_.keySet).toSet
      assert(groups(free) == groups(sorted), s"rounds=$r")
      // residues sit in their moduli
      free.values.foreach { case (_, p1, p2) =>
        assert(p1 >= 0 && p1 < 1000000007L)
        assert(p2 >= 0 && p2 < 998244353L)
      }
    }
  }

  test("wlGraphSignature family rejects ':' in graph ids loudly " +
      "(silent truncation would mis-group labels)") {
    val bad = Seq(("a:b", 1L, 2L), ("a:b", 2L, 3L))
      .toDF("graph_id", "src", "dst")
    val e = intercept[Exception] {
      GraphOps.wlGraphSignature(bad, "graph_id", "src", "dst", 1)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("scoping separator")), e.toString)
    // the order-free form shares the guard
    val e2 = intercept[Exception] {
      GraphOps.wlGraphSignatureOrderFree(bad, "graph_id", "src",
        "dst", 1).collect()
    }
    assert(msgs(e2).exists(_.contains("scoping separator")), e2.toString)
  }

  test("duplicateCoverage: every doc present, spans account exactly, " +
      "fraction bounded, zero-coverage docs report 0") {
    val rnd = new scala.util.Random(113)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel")
    def sentence(n: Int): String =
      (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val boiler = "one two three four five six seven eight"
    // docs 1/2 share the planted 8-token boilerplate; docs 3+ are
    // random (may or may not collide — the invariants don't care)
    val docs = Seq(
      (1L, s"${sentence(20)} $boiler ${sentence(15)}"),
      (2L, s"$boiler ${sentence(30)}"),
      (3L, sentence(25)),
      (4L, sentence(4)), // shorter than l → no grams, coverage 0
    ).toDF("doc_id", "text")
    val l = 8
    val cov = Dedup.duplicateCoverage(docs, "doc_id", "text", l)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(cov.keySet == Set(1L, 2L, 3L, 4L))
    // accounting: dup_tokens equals the sum of merged span lengths
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", l)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getLong(3)).sum).toMap
    cov.foreach { case (id, (nTok, dup, pm)) =>
      assert(dup == spans.getOrElse(id, 0L), s"doc $id")
      assert(dup >= 0 && dup <= nTok, s"doc $id: $dup vs $nTok")
      assert(pm == 1000 * dup / math.max(nTok, 1L), s"doc $id")
      assert(pm >= 0 && pm <= 1000)
    }
    // the planted pair is detected; the short doc reports zero
    assert(cov(1L)._2 >= l && cov(2L)._2 >= l)
    assert(cov(4L)._2 == 0L && cov(4L)._3 == 0L)
  }

  test("prefixFilterJaccardPairs equals ngramJaccardPairs: two " +
      "independent candidate blockings, one exact pair truth") {
    import org.apache.spark.sql.functions.col
    val docs = graft.model.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSet
    val lsh = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, tau = 0.5))
    val pf = pairs(Dedup.prefixFilterJaccardPairs(docs, "doc_id",
      "text", n = 3, tau = 0.5))
    assert(pf == lsh, s"prefix-filter ${pf.size} vs LSH ${lsh.size}")
    assert(pf.nonEmpty) // the fixture corpus has planted near-dups
    // space-padded text: both paths trim before tokenizing (the house
    // gram convention, r12 — SQL trim strips SPACES, matching the
    // oracles' string_split(trim(text))) — a padded verbatim copy of
    // doc 1 must score jaccard 1.0 against it on BOTH paths (untrimmed,
    // the leading pad grows a "" token via split's keep-leading-empty
    // semantics and the copy scores < 1)
    val padded = docs.unionByName(
      docs.filter(col("doc_id") === 1)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(lit("   "), col("text"), lit("  ")).as("text")))
    Seq(
      pairs(Dedup.ngramJaccardPairs(padded, "doc_id", "text",
        n = 3, tau = 0.5)),
      pairs(Dedup.prefixFilterJaccardPairs(padded, "doc_id", "text",
        n = 3, tau = 0.5)),
    ).foreach { ps =>
      assert(ps.exists { case (a, b, j) =>
        a == 1L && b == 2000001L && j == 1.0 }, ps.toString)
    }
    // planted sanity: a verbatim copy scores jaccard 1.0 and survives
    // both paths
    val aug = docs.unionByName(
      docs.filter(col("doc_id") === 1)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val dup = pairs(Dedup.prefixFilterJaccardPairs(aug, "doc_id",
      "text", n = 3, tau = 0.5))
    assert(dup.exists { case (a, b, j) =>
      a == 1L && b == 1000001L && j == 1.0 })
  }

  test("weightedQuantilesLong on PrefixScan: partition-count-invariant " +
      "and equal to the serial weighted rank") {
    val rnd = new scala.util.Random(117)
    val rows = (1 to 300).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(9) + 1L))
    val ps = Seq(0.25, 0.5, 0.9, 1.0)
    // serial oracle: per-value weight sums, ascending cum, first value
    // whose cum >= ceil(p*W)
    val perV = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val total = perV.map(_._2).sum
    val cum = perV.scanLeft((0L, 0L)) { case ((_, c), (v, w)) =>
      (v, c + w) }.tail
    val expect = ps.map { p =>
      val t = math.ceil(p * total.toDouble).toLong
      p -> cum.find(_._2 >= t).get._1
    }.toMap
    for (parts <- Seq(1, 5, 32)) {
      val got = SketchStats.weightedQuantilesLong(
          rows.toDF("v", "w").repartition(parts), "v", "w", ps)
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      assert(got == expect, s"parts=$parts")
    }
  }
}
