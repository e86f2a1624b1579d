package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OLAP/analytics completions: distributed NTILE, grouped OLS,
  * Pearson pairs, sweep-line concurrency, containment pairs,
  * Cohen's kappa, percentile rank. */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("globalNtile: replays SQL NTILE's remainder contract") {
    // n=10, k=3 → tile sizes 4,3,3 (first n mod k tiles get ceil(n/k))
    val df = (1L to 10L).toDF("v")
    val out = SketchStats.globalNtile(df, Seq(col("v").asc), k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1,
      5L -> 2, 6L -> 2, 7L -> 2, 8L -> 3, 9L -> 3, 10L -> 3))
    // n divisible by k → equal tiles
    val even = SketchStats.globalNtile((1L to 9L).toDF("v"),
        Seq(col("v").asc), k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(even(3L) == 1 && even(4L) == 2 && even(9L) == 3)
    // n < k: every row its own tile, no division by zero
    val tiny = SketchStats.globalNtile((1L to 2L).toDF("v"),
        Seq(col("v").asc), k = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tiny == Map(1L -> 1, 2L -> 2))
  }

  test("globalNtile: null ordering values rank first (asc nulls-first), " +
      "tile sizes keep the NTILE contract") {
    val df = Seq((Some(5L), 1L), (None: Option[Long], 2L), (Some(1L), 3L),
      (None: Option[Long], 4L), (Some(3L), 5L), (Some(2L), 6L),
      (Some(4L), 7L)).toDF("v", "id")
    val out = SketchStats.globalNtile(df,
        Seq(col("v").asc, col("id").asc), k = 3)
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    // n=7, k=3 → sizes 3,2,2; nulls (ids 2,4) sort first → tile 1
    assert(out(2L) == 1 && out(4L) == 1 && out(3L) == 1) // null,null,v=1
    assert(out(6L) == 2 && out(5L) == 2)                 // v=2,3
    assert(out(1L) == 3 && out(7L) == 3)                 // v=4,5 hi tile
  }

  test("groupedOls: exact fit on a planted line, degenerate groups null") {
    // g1: y = 3x + 10 exactly; g2: single point; g3: zero x-variance
    val df = Seq(
      ("g1", 1L, 13L), ("g1", 2L, 16L), ("g1", 3L, 19L),
      ("g2", 5L, 7L),
      ("g3", 4L, 1L), ("g3", 4L, 9L),
    ).toDF("g", "x", "y")
    val out = SketchStats.groupedOls(df, "g", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g1").getAs[Double]("slope") == 3.0)
    assert(out("g1").getAs[Double]("intercept") == 10.0)
    assert(out("g2").isNullAt(out("g2").fieldIndex("slope")))
    assert(out("g3").isNullAt(out("g3").fieldIndex("slope")))
  }

  test("pearsonPairs: perfect correlation, sign, zero-variance null") {
    val df = Seq((1L, 2L, 5L), (2L, 4L, 5L), (3L, 6L, 5L))
      .toDF("a", "b", "c")
    val out = SketchStats.pearsonPairs(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // |r| reaches 1 only to sqrt's rounding (sqrt(vx)*sqrt(vy) vs the
    // exact vx·vy product) — the op's contract is cross-ENGINE bit
    // equality, not algebraic exactness
    assert(math.abs(out(("a", "b")).getAs[Double]("r") - 1.0) < 1e-12)
    assert(out(("a", "c")).isNullAt(3)) // c constant → undefined
    val anti = SketchStats.pearsonPairs(
      Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("a", "b"), Seq("a", "b"))
      .collect()(0).getAs[Double]("r")
    assert(math.abs(anti + 1.0) < 1e-12)
  }

  test("maxConcurrency: half-open intervals, end==start no overlap") {
    val df = Seq(
      // g1: [0,10) [5,15) [20,30) → peak 2; [10,..) starts AT an end
      ("g1", 0L, 10L), ("g1", 5L, 15L), ("g1", 20L, 30L),
      ("g1", 10L, 12L), // touches the first interval's end: NO overlap
      // g2: three nested → peak 3
      ("g2", 0L, 100L), ("g2", 10L, 90L), ("g2", 20L, 80L),
      // g3: null bounds only → group drops
      ("g3", 5L, -1L),
    ).toDF("g", "s", "e")
      .withColumn("s", when(col("e") < 0, lit(null)).otherwise(col("s")))
    val out = TemporalJoins.maxConcurrency(df, "g", "s", "e")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("g1" -> 2L, "g2" -> 3L))
  }

  test("containmentPairs: full subset scores 1e6 from its side") {
    val df = Seq(
      (1L, "a b c d e f g h"),      // superset doc
      (2L, "c d e f g"),            // fully contained 3-gram-wise
      (3L, "x y z w v"),            // unrelated
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text", n = 3,
        maxDf = 100L, tauPpm = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out.keySet == Set((1L, 2L)))
    val r = out((1L, 2L))
    // doc2's 3 grams (cde, def, efg) all appear among doc1's 6
    assert(r.getAs[Long]("shared") == 3L)
    assert(r.getAs[Long]("containment_b_ppm") == 1000000L)
    assert(r.getAs[Long]("containment_a_ppm") == 500000L)
  }

  test("cohenKappa: perfect, independent, and null-row handling") {
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x"))
      .toDF("a", "b")
    assert(Scoring.cohenKappa(perfect, "a", "b")
      .collect()(0).getAs[Long]("kappa_ppm") == 1000000L)
    // 2×2 balanced independence → kappa 0
    val indep = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y"))
      .toDF("a", "b")
    assert(Scoring.cohenKappa(indep, "a", "b")
      .collect()(0).getAs[Long]("kappa_ppm") == 0L)
    // null labels excluded, not counted as disagreement
    val withNull = Seq(("x", "x"), ("y", "y"), (null, "x"), ("x", null))
      .toDF("a", "b")
    val row = Scoring.cohenKappa(withNull, "a", "b").collect()(0)
    assert(row.getAs[Long]("n") == 2L)
    assert(row.getAs[Long]("kappa_ppm") == 1000000L)
    // both constant and identical → denominator 0 → null
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val cRow = Scoring.cohenKappa(const, "a", "b").collect()(0)
    assert(cRow.isNullAt(cRow.fieldIndex("kappa_ppm")))
  }

  test("percentileRankByGroup: pinned ranks, singleton at 0") {
    val df = Seq(("g1", 10L, 1L), ("g1", 20L, 2L), ("g1", 20L, 3L),
      ("g1", 30L, 4L), ("g2", 5L, 9L)).toDF("g", "v", "id")
    val out = Scoring.percentileRankByGroup(df, "g", "v", "id")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("group_rank"), r.getAs[Long]("pct_pm")))).toMap
    assert(out(1L) == ((1L, 0L)))
    assert(out(2L) == ((2L, 333L))) // tie on v broken by id
    assert(out(3L) == ((3L, 666L)))
    assert(out(4L) == ((4L, 1000L)))
    assert(out(9L) == ((1L, 0L))) // singleton group
  }

  test("splitToDouble: exact below 2^53, sign-symmetric, and within " +
      "1 ulp of the correctly-rounded value past 2^53") {
    val rng = new scala.util.Random(41)
    val cases: Seq[BigInt] =
      Seq[BigInt](0, 1, -1, (BigInt(1) << 53) - 1, BigInt(1) << 53,
        (BigInt(1) << 53) + 1, BigInt(1) << 64, (BigInt(1) << 80) - 7) ++
        (1 to 40).map(_ => BigInt(70, rng) - (BigInt(1) << 69))
    val df = cases.map(_.toString).toDF("s")
      .select(col("s").cast("decimal(38,0)").as("v"))
    val got = df.select(SketchStats.splitToDouble("v").as("d"))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case (v, d) =>
      val exact = new java.math.BigDecimal(v.bigInteger).doubleValue()
      if (v.abs < (BigInt(1) << 53))
        assert(d == exact, s"$v must convert exactly, got $d")
      else {
        // double-rounding through hi*2^32 + lo can differ from the
        // correctly-rounded cast by at most one ulp — what matters is
        // that BOTH engines replay the same split, but the result must
        // still be essentially the value
        assert(math.abs(d - exact) <= math.ulp(exact),
          s"$v: $d vs correctly-rounded $exact")
      }
    }
    // sign symmetry: split(-v) == -split(v) for every case
    val neg = cases.map(v => (-v).toString).toDF("s")
      .select(col("s").cast("decimal(38,0)").as("v"))
      .select(SketchStats.splitToDouble("v").as("d"))
      .collect().map(_.getDouble(0))
    got.zip(neg).foreach { case (p, n) => assert(n == -p) }
  }

  test("groupedOls / pearsonPairs: null inputs drop as complete pairs " +
      "— n stays consistent with the sums") {
    // g1 carries a null-y row that must NOT count toward n: with it
    // dropped, the remaining points sit exactly on y = 3x + 10
    val df = Seq(
      ("g1", Some(1L), Some(13L)), ("g1", Some(2L), Some(16L)),
      ("g1", Some(3L), None: Option[Long]), ("g1", Some(4L), Some(22L)),
      ("g1", None: Option[Long], Some(99L)),
    ).toDF("g", "x", "y")
    val ols = SketchStats.groupedOls(df, "g", "x", "y").collect().head
    assert(ols.getAs[Long]("n") == 3L)
    assert(ols.getAs[Double]("slope") == 3.0)
    assert(ols.getAs[Double]("intercept") == 10.0)
    // pearson: the null row is deleted listwise; the remaining three
    // (x, y) points are perfectly correlated -> r == 1.0 exactly
    val pp = Seq((Some(1L), Some(2L)), (Some(2L), Some(4L)),
        (None: Option[Long], Some(7L)), (Some(3L), Some(6L)))
      .toDF("a", "b")
    val r = SketchStats.pearsonPairs(pp, Seq("a", "b")).collect().head
    assert(r.getAs[Long]("n") == 3L)
    // perfect correlation up to sqrt rounding (the formula does not
    // guarantee exactly 1.0; with the null row COUNTED, r would be
    // wildly off, which is what this guards)
    assert(math.abs(r.getAs[Double]("r") - 1.0) < 1e-12)
  }
}
