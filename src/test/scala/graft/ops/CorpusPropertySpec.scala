package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the corpus operators: packing interval algebra
  * over random token counts, and hash-split assignment law. Batched —
  * one Spark job per property. */
class CorpusPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(7L + i)))

  test("packing: contiguity + chunk arithmetic hold for random inputs") {
    // zero-token docs included: they get the degenerate point span
    val counts = samples(Gen.chooseNum(0, 2000), 300)
    val df = counts.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n")
    val L = 128
    val rows = Packing.chunkAssignments(df, "doc_id", $"n", L)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"token_start", $"token_end",
        $"first_chunk", $"last_chunk", $"chunk_offset")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    // intervals tile the stream with no gaps or overlap
    assert(rows.head._3 == 0L)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._4); case _ => ()
    }
    rows.foreach { case (_, n, s, e, fc, lc, off) =>
      assert(e - s == n)
      assert(fc == s / L)
      assert(lc == (if (n == 0) s / L else (e - 1) / L))
      assert(off == s % L && off >= 0 && off < L)
      assert(fc <= lc)
    }
  }

  test("packing: two-pass distributed scan == single-window reference") {
    import org.apache.spark.sql.expressions.Window
    val counts = samples(Gen.chooseNum(0, 500), 200)
    val df = counts.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n")
    val dist = Packing
      .chunkAssignments(df, "doc_id", $"n", 64, numPartitions = 7)
      .select($"doc_id", $"token_end").as[(Long, Long)].collect().toMap
    val w = Window.orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.select($"doc_id",
        sum($"n".cast("long")).over(w).as("token_end"))
      .as[(Long, Long)].collect().toMap
    assert(dist == ref)
  }

  test("hash split: every bucket obeys its threshold band, any seed") {
    val seeds = Seq("a", "b", "xyz")
    for (seed <- seeds) {
      val out = Sampling.hashSplit(spark.range(2000).toDF("id"), "id", seed)
        .select($"bucket", $"split").as[(Long, String)].collect()
      out.foreach { case (b, s) =>
        assert(b >= 0 && b < 10000)
        val expect = if (b < 8000) "train" else if (b < 9000) "val" else "test"
        assert(s == expect, s"bucket $b -> $s")
      }
    }
  }

  test("winnowing: native sketch == HOF twin on random strings and params") {
    // the monotonic-deque sliding min is the riskiest loop in the native
    // sketch; drive it with random texts (repeats included so window
    // minima tie) across (k, w) shapes, incl. w > gram count
    val gen = for {
      n <- Gen.chooseNum(0, 120)
      s <- Gen.stringOfN(n, Gen.oneOf(('a' to 'e') :+ ' '))
    } yield s
    val texts = samples(gen, 150).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    for ((k, w) <- Seq((3, 5), (8, 4), (12, 16), (5, 200))) {
      val native = TextAnalysis.winnowingFingerprints(df, "doc_id", "text", k, w)
        .as[(Long, Long)].collect().toSet
      val hof = TextAnalysis.winnowingFingerprintsHof(df, "doc_id", "text", k, w)
        .as[(Long, Long)].collect().toSet
      assert(native == hof, s"k=$k w=$w")
    }
  }

  test("cross-corpus pairs == self-dedup pairs restricted to the cut " +
      "(consistency between the two LSH paths)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val newSide = docs.filter($"doc_id" % 3 === 0)
    val oldSide = docs.filter($"doc_id" % 3 =!= 0)
    val cross = Dedup.crossCorpusJaccardPairs(newSide, oldSide,
        "doc_id", "text", n = 3, tau = 0.5)
      .select($"id_new", $"id_old").as[(Long, Long)].collect().toSet
    // the self-dedup over the union, restricted to pairs with exactly
    // one endpoint on each side (self emits idA < idB; reorient to
    // (new, old))
    val self = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, tau = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .filter { case (a, b) => (a % 3 == 0) != (b % 3 == 0) }
      .map { case (a, b) => if (a % 3 == 0) (a, b) else (b, a) }
      .toSet
    assert(cross == self)
  }

  test("tfidf plan broadcasts the vocabulary side") {
    val d = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.tfIdfTop(d, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
  }
}
