package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DBSCAN roles/clusters, Poisson bootstrap, Jaccard medoids — all
  * expectations hand-computed. */
class DensityCanonSpec extends SparkSpec {
  import spark.implicits._

  test("dbscanGrid: core/border/noise roles, isolated core forms a " +
      "singleton cluster") {
    // line: 1(0,0) 2(10,0) 3(20,0), far: 4(100,0), 5(300,0); r=15,
    // minPts=3 → only 2 is core ({1,3} + itself); 1,3 border on 2's
    // singleton cluster; 4,5 noise
    val pts = Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 20L, 0L),
      (4L, 100L, 0L), (5L, 300L, 0L)).toDF("id", "x", "y")
    val out = GeoOps.dbscanGrid(pts, "id", "x", "y", r = 15L, minPts = 3)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      1L -> (("border", 2L)), 2L -> (("core", 2L)),
      3L -> (("border", 2L)), 4L -> (("noise", -1L)),
      5L -> (("noise", -1L))))
  }

  test("dbscanGrid: two cores merge through a core–core edge, cluster " +
      "labelled by the min core id") {
    // 1(0,0) 2(10,0) 3(20,0) 4(30,0), r=15, minPts=3:
    // 2 and 3 are cores (edge 2–3), 1 and 4 borders of cluster 2
    val pts = Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 20L, 0L),
      (4L, 30L, 0L)).toDF("id", "x", "y")
    val out = GeoOps.dbscanGrid(pts, "id", "x", "y", r = 15L, minPts = 3)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      1L -> (("border", 2L)), 2L -> (("core", 2L)),
      3L -> (("core", 2L)), 4L -> (("border", 2L))))
  }

  test("poissonBootstrap: deterministic, n = Σw, constant values give " +
      "exactly the true mean in every non-empty replica") {
    val df = (1L to 200L).map(i => (i, 10L)).toDF("id", "v")
    val out = Sampling.poissonBootstrap(df, "id", "v", reps = 8,
      seed = "t1").as[(Long, Long, Long, Long)].collect()
    assert(out.length == 8)
    out.foreach { case (_, n, s, mean) =>
      assert(n > 100 && n < 320, s"replica size implausible: $n")
      assert(s == 10L * n)
      assert(mean == 10L)
    }
    val again = Sampling.poissonBootstrap(df, "id", "v", reps = 8,
      seed = "t1").as[(Long, Long, Long, Long)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // a different seed reweights
    val other = Sampling.poissonBootstrap(df, "id", "v", reps = 8,
      seed = "t2").as[(Long, Long, Long, Long)].collect()
    assert(!out.sortBy(_._1).sameElements(other.sortBy(_._1)))
  }

  test("naiveBayesConfusionMilli: a separable two-class corpus " +
      "classifies perfectly; scores replay by hand") {
    // class a docs say only 'x', class b docs only 'y' — any test doc
    // must be predicted as its own class
    val docs = (1L to 40L).map { i =>
      val c = if (i % 2 == 0) "a" else "b"
      (i, if (c == "a") "x x x" else "y y y", c)
    }.toDF("doc_id", "text", "lbl")
    val out = Scoring.naiveBayesConfusionMilli(docs, "doc_id", "text",
      "lbl", seed = "t")
      .as[(String, String, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (actual, predicted, _) =>
      assert(actual == predicted, s"$actual misclassified as $predicted")
    }
  }

  test("symspellCandidates: 1-deletion neighborhoods find all ed<=1 " +
      "matches, equi-join never admits ed>=2") {
    val vocab = Seq(("spark", 10L), ("spare", 4L), ("spar", 2L),
      ("scala", 7L)).toDF("w", "f")
    val queries = Seq("spak", "spark", "zzz").toDF("q")
    val out = TextAnalysis.symspellCandidates(vocab, "w", "f",
      queries, "q")
      .select($"query", $"cand").as[(String, String)].collect().toSet
    // spak: deletion of 'r' from spark (ed 1); spar by one insert? no:
    // spak→spar is substitution k→r = ed 1, shares deletion 'spa'+..?
    // spak deletions: pak, sak, spk, spa, spak; spar deletions include
    // spa → shared key 'spa' → candidate, ed(spak, spar)=1 ✓
    assert(out.contains(("spak", "spark")))
    assert(out.contains(("spak", "spar")))
    assert(out.contains(("spark", "spark"))) // exact hit, ed 0
    assert(out.contains(("spark", "spare"))) // substitution, ed 1
    assert(!out.exists(_._1 == "zzz")) // nothing within ed 1
    assert(!out.contains(("spak", "scala"))) // ed 3 never admitted
  }

  test("clusterMedoids: medoid is the most central member (not the " +
      "min id), singletons are their own medoid") {
    // grams: A=8, B=A+1 new, C=A+2 new; per-mille distances
    // d(A,B)=112, d(A,C)=200, d(B,C)=100 → sums A=312 B=212 C=300
    val base = "a b c d e f g h i j"
    val docs = Seq(
      (1L, base), (2L, base + " k"), (3L, base + " k l"),
      (4L, "z y x w v u t s r q"),
    ).toDF("doc_id", "text")
    val out = Dedup.clusterMedoids(docs, "doc_id", "text",
      n = 3, tau = 0.5)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 3L, 212L))) // cluster 1: medoid B, 3 members
    assert(out(4L) == ((4L, 1L, 0L))) // singleton
    assert(out.size == 2)
  }
}
