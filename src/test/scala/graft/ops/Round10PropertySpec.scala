package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

import graft.SparkSpec

/** Property tests for the round-10 operators: PrefixScan's
  * partition-count invariance (the defining law of a correct
  * distributed scan), WL graph-signature isomorphism invariance under
  * random relabeling, duplicate-span structural invariants and
  * corpus-order invariance, and end-to-end MMR containment. Randomized
  * with fixed seeds — deterministic, like Round9PropertySpec. */
class Round10PropertySpec extends SparkSpec {
  import spark.implicits._

  test("PrefixScan: running-sum output is invariant to the partition " +
      "count and equals the sequential fold (the scan law)") {
    val rnd = new scala.util.Random(101)
    val xs = (1L to 400L).map(t => (t, rnd.nextInt(2001) - 1000L))
    val expected = xs.map(_._2).scanLeft(0L)(_ + _).tail
      .zip(xs.map(_._1)).map { case (c, t) => (t, c) }.toSet
    val m = new PrefixScan.ScanMonoid[Long] {
      def stepCols: Seq[String] = Seq("x")
      def zero: Long = 0L
      def step(s: Long, v: Array[Any]): Long =
        s + v(0).asInstanceOf[Long]
      def combine(a: Long, b: Long): Long = a + b
      def emit(post: Long, v: Array[Any]): Seq[Any] = Seq(post)
    }
    for (p <- Seq(1, 2, 7, 32)) {
      val got = PrefixScan.scan[Long](
          rnd.shuffle(xs).toDF("t", "x"), Seq(col("t")),
          Seq(StructField("cum", LongType, nullable = false)), m,
          numPartitions = p)
        .select("t", "cum").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"p=$p")
    }
  }

  test("wlGraphSignature: invariant under random node relabeling and " +
      "graph-id renaming (isomorphism never changes the signature)") {
    val rnd = new scala.util.Random(103)
    // a random 14-node graph, then the SAME graph under a random
    // permutation of node ids — signatures must match at every depth
    val edges = (1 to 25).map(_ =>
      (rnd.nextInt(14).toLong, rnd.nextInt(14).toLong))
      .filter { case (a, b) => a != b }.distinct
    val perm = rnd.shuffle((0L to 13L).toVector)
    val relabeled = edges.map { case (a, b) =>
      (perm(a.toInt), perm(b.toInt)) }
    val df = (edges.map { case (a, b) => (1L, a, b) } ++
      relabeled.map { case (a, b) => (2L, a, b) })
      .toDF("graph_id", "src", "dst")
    for (r <- Seq(0, 1, 3)) {
      val sig = GraphOps.wlGraphSignature(df, "graph_id", "src", "dst",
          rounds = r)
        .collect().map(x => x.getString(0) ->
          ((x.getLong(1), x.getString(2)))).toMap
      assert(sig("1") == sig("2"), s"rounds=$r")
    }
  }

  test("duplicateSpans: spans are disjoint with gaps > 0, each >= l, " +
      "inside the doc, and the span set is corpus-order invariant") {
    val rnd = new scala.util.Random(107)
    val vocab = (0 until 12).map(i => s"w$i")
    def doc(n: Int): String =
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // small vocab + 40-120-token docs → plenty of genuine repeats
    val docs = (1L to 30L).map(i => (i, doc(40 + rnd.nextInt(80))))
    val l = 4
    val out = Dedup.duplicateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", l = l)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty) // the construction guarantees duplicates
    val lens = docs.map { case (i, t) => i -> t.split(" ").length }.toMap
    out.groupBy(_._1).foreach { case (id, spans) =>
      val sorted = spans.sortBy(_._2)
      sorted.foreach { case (_, s, e) =>
        assert(e - s >= l && s >= 1 && e <= lens(id) + 1,
          s"doc $id span [$s,$e) vs len ${lens(id)}")
      }
      sorted.toSeq.sliding(2).foreach {
        case Seq((_, _, e1), (_, s2, _)) =>
          assert(s2 > e1, s"doc $id: spans merge-adjacent or overlap")
        case _ =>
      }
    }
    // shuffling the corpus rows changes nothing (frequency is global)
    val shuffled = Dedup.duplicateSpans(
        rnd.shuffle(docs).toDF("doc_id", "text"), "doc_id", "text", l = l)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(shuffled.toSet == out.toSet)
  }

  test("mmrDiversifyEmbeddings: per-query ranks are contiguous 1..k, " +
      "selections are distinct and drawn from the true top-N shortlist") {
    val rnd = new scala.util.Random(109)
    val emb = (0L until 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextDouble() * 2 - 1)))
    val df = emb.toDF("vec_id", "embedding")
    val n = 6; val k = 3
    val out = Fusion.mmrDiversifyEmbeddings(df, "vec_id", "embedding",
        col("vec_id") % 20 === 0, shortlistN = n, k = k,
        lambdaPermille = 500)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc"),
        r.getAs[Int]("mmr_rank")))
    val shortlist = Similarity.cosineTopKKernelForQueries(df, "vec_id",
        "embedding", n, col("vec_id") % 20 === 0)
      .collect().map(r => (r.getAs[Long]("id"),
        r.getAs[Long]("neighbor_id"))).toSet
    out.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to k))
      assert(rows.map(_._2).distinct.length == k)
      rows.foreach { case (q, d, _) =>
        assert(shortlist.contains((q, d)), s"($q,$d) not in shortlist") }
    }
    assert(out.groupBy(_._1).size == 3) // vec_ids 0, 20, 40
  }
}
