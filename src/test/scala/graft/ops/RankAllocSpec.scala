package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rank statistics, Holt smoothing, apportionment, CMS gate — every
  * expectation hand-computed on paper-sized inputs. */
class RankAllocSpec extends SparkSpec {
  import spark.implicits._

  test("avgRankX2: doubled average ranks with ties, 2·minrank+cnt−1") {
    // values 1, 2, 2, 3 → avg ranks 1, 2.5, 2.5, 4 → doubled 2, 5, 5, 8
    val df = Seq((1L, 10L), (2L, 11L), (2L, 12L), (3L, 13L))
      .toDF("v", "uid")
    val out = RankStats.avgRankX2(df, "v", "uid", "rx2")
      .select($"uid", $"rx2").as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 2L, 11L -> 5L, 12L -> 5L, 13L -> 8L))
  }

  test("mannWhitneyUx2: hand case, U1+U2 = 2·n1·n2 identity") {
    // A: [1, 2]  B: [2, 3] → doubled ranks 2,5 | 5,8
    // R_A·2 = 7, U_A·2 = 7 − 2·3 = 1; R_B·2 = 13, U_B·2 = 13 − 6 = 7
    val df = Seq(("A", 1L, 1L), ("A", 2L, 2L), ("B", 2L, 3L),
      ("B", 3L, 4L)).toDF("grp", "v", "uid")
    val out = RankStats.mannWhitneyUx2(df, "grp", "v", "uid")
      .select($"grp", $"n", $"r_x2", $"u_x2")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("A") == ((2L, 7L, 1L)))
    assert(out("B") == ((2L, 13L, 7L)))
    // U1 + U2 = n1·n2 (doubled: ·2)
    assert(out("A")._3 + out("B")._3 == 2L * 2L * 2L)
  }

  test("mannWhitneyUx2 refuses != 2 groups") {
    val df = Seq(("A", 1L, 1L), ("B", 2L, 2L), ("C", 3L, 3L))
      .toDF("grp", "v", "uid")
    intercept[IllegalArgumentException] {
      RankStats.mannWhitneyUx2(df, "grp", "v", "uid")
    }
  }

  test("spearman: perfect monotone → 1, mirrored with ties → −1, " +
      "exact integer sufficient sums") {
    val up = Seq((1L, 10L, 1L), (2L, 20L, 2L), (3L, 30L, 3L))
      .toDF("x", "y", "uid")
    val r1 = RankStats.spearman(up, "x", "y", "uid")
      .select($"rho").as[Double].head()
    assert(math.abs(r1 - 1.0) < 1e-12, r1)
    // x=[1,2,2,4], y=10−x → doubled ranks (2,5,5,8) vs (8,5,5,2)
    val down = Seq((1L, 9L, 1L), (2L, 8L, 2L), (2L, 8L, 3L),
      (4L, 6L, 4L)).toDF("x", "y", "uid")
    val row = RankStats.spearman(down, "x", "y", "uid")
      .select($"n", $"sx", $"sy", $"sxx", $"syy", $"sxy", $"rho")
      .as[(Long, Long, Long, Long, Long, Long, Double)].head()
    assert(row._1 == 4L && row._2 == 20L && row._3 == 20L)
    assert(row._4 == 118L && row._5 == 118L && row._6 == 82L)
    assert(math.abs(row._7 + 1.0) < 1e-12, row._7)
  }

  test("holtInt: ramp tracked through the trend term, seeded state") {
    // x=[10,14,18], denL=2, denT=2:
    //   i=1: l=10 b=0 f=10
    //   i=2: f=10, l=10+(4 div 2)=12, b=0+((12−10−0) div 2)=1
    //   i=3: f=13, l=13+(5 div 2)=15, b=1+((15−12−1) div 2)=2
    val df = Seq(("k", 1L, 10L), ("k", 2L, 14L), ("k", 3L, 18L))
      .toDF("key", "o", "x")
    val out = SeriesStats.holtInt(df, "key", Seq("o"), "x", 2, 2)
      .select($"rn", $"level", $"trend", $"forecast")
      .as[(Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1) == ((10L, 0L, 10L)))
    assert(out(2) == ((12L, 1L, 10L)))
    assert(out(3) == ((15L, 2L, 13L)))
  }

  test("holtInt: negative delta truncates toward zero (sign guard)") {
    // x=[10,0], denL=4: l2 = 10 + sdiv(−10,4) = 10 − 2 = 8 (floor
    // would give 7); b2 = 0 + sdiv(−2,4) = 0
    val df = Seq(("k", 1L, 10L), ("k", 2L, 0L)).toDF("key", "o", "x")
    val out = SeriesStats.holtInt(df, "key", Seq("o"), "x", 4, 4)
      .select($"rn", $"level", $"trend").as[(Int, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(2) == ((8L, 0L)))
  }

  test("largestRemainder: Σalloc == total, remainder order, key tie") {
    // weights 5,3,2 total 7: bases 3,2,1 (Σ6), rems 5,1,4 → a +1
    val df = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("g", "w")
    val out = Sampling.largestRemainder(df, "g", col("w"), 7L)
      .select($"g", $"alloc").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    // all-equal weights: remainder tie broken by key ascending
    val eq = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("g", "w")
    val out2 = Sampling.largestRemainder(eq, "g", col("w"), 10L)
      .select($"g", $"alloc").as[(String, Long)].collect().toMap
    assert(out2 == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    assert(out2.values.sum == 10L)
  }

  test("weightedQuantilesLong: cumulative-weight rank, duplicate " +
      "values merge, non-positive weights dropped") {
    // per-value weights after merge: v1→1, v2→3, v3→6; W=10
    val df = Seq((1L, 1L), (2L, 1L), (2L, 2L), (3L, 6L), (0L, 0L),
      (9L, -5L)).toDF("v", "w")
    val out = SketchStats.weightedQuantilesLong(df, "v", "w",
      Seq(0.1, 0.4, 0.5, 1.0))
      .as[(Double, Long)].collect().toMap
    // targets ceil(p·10): 1→v1, 4→v2, 5→v3 (cum 1,4,10), 10→v3
    assert(out == Map(0.1 -> 1L, 0.4 -> 2L, 0.5 -> 3L, 1.0 -> 3L))
  }

  test("weightedQuantilesLong matches row-counted quantiles when all " +
      "weights are 1") {
    val vals = (1L to 100L).map(v => (v, 1L))
    val df = vals.toDF("v", "w").repartition(7)
    val out = SketchStats.weightedQuantilesLong(df, "v", "w",
      Seq(0.25, 0.5, 0.99)).as[(Double, Long)].collect().toMap
    assert(out == Map(0.25 -> 25L, 0.5 -> 50L, 0.99 -> 99L))
  }

  test("ksTestScaled: hand ECDF case, identical samples give 0, " +
      "disjoint give n1*n2") {
    // A=[1,2,3] B=[2,3,4]: max|cum1*n2 - cum2*n1| = 3 (D = 1/3)
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 2L),
      ("B", 3L), ("B", 4L)).toDF("g", "v")
    val r = RankStats.ksTestScaled(df, "g", "v")
      .as[(Long, Long, Long)].head()
    assert(r == ((3L, 3L, 3L)))
    val same = Seq(("A", 5L), ("B", 5L), ("A", 9L), ("B", 9L))
      .toDF("g", "v")
    assert(RankStats.ksTestScaled(same, "g", "v")
      .as[(Long, Long, Long)].head()._3 == 0L)
    val disj = Seq(("A", 1L), ("A", 2L), ("B", 10L)).toDF("g", "v")
    // fully separated: D = 1 → scaled = n1*n2 = 2
    assert(RankStats.ksTestScaled(disj, "g", "v")
      .as[(Long, Long, Long)].head()._3 == 2L)
  }

  test("joinSizeEstimate: sum of per-key count products, empty " +
      "intersection gives 0, hot key named") {
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 1L, 2L, 9L).toDF("k")
    // products: k1 → 3·2 = 6, k2 → 1·1 = 1 → predicted 7, max 6
    val row = SkewOps.joinSizeEstimate(a, b, "k")
      .as[(Long, Long)].head()
    assert(row == ((7L, 6L)))
    assert(row._1 == a.join(b, "k").count())
    val none = Seq(5L).toDF("k")
    assert(SkewOps.joinSizeEstimate(a, none, "k")
      .as[(Long, Long)].head() == ((0L, 0L)))
  }

  test("groupEntropyMilli: pure group → 0, uniform over 2 → " +
      "floor(1000·ln 2), convention matches a by-hand replay") {
    val df = Seq(("u1", "a"), ("u1", "a"), ("u1", "a"),
      ("u2", "a"), ("u2", "b"),
      ("u3", "a"), ("u3", "a"), ("u3", "b")).toDF("g", "c")
    val out = SketchStats.groupEntropyMilli(df, "g", "c")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("u1") == ((3L, 0L))) // one category: ln3 − (3·ln3)/3 = 0
    assert(out("u2") == ((2L, 693L))) // uniform 2: floor(1000·ln2)
    // u3: floor(1000·ln3) − (2·floor(1000·ln2) + 1·0) div 3
    //   = 1098 − (1386 div 3) = 1098 − 462 = 636
    assert(out("u3") == ((3L, 636L)))
  }

  test("cmsPointGate: exact top-k, never undercounts, bound holds " +
      "across partitions") {
    val rows = Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)
    val df = rows.toDF("k").repartition(4)
    val out = SketchStats
      .cmsPointGate(df, "k", k = 2, eps = 0.01, conf = 0.99, seed = 7)
      .as[(Long, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(1L -> ((5L, true, true)), 2L -> ((3L, true, true))))
  }
}
