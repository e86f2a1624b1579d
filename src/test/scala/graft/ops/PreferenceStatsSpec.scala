package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Preference/feature-stat additions: Bradley–Terry MM, decayed
  * engagement score, Gini concentration, chi-square cells. */
class PreferenceStatsSpec extends SparkSpec {
  import spark.implicits._

  test("bradleyTerry: dominant candidate ranks first, integer " +
      "recurrence replayable by hand") {
    // a beats b twice, b beats c twice, a beats c twice → a > b > c
    val prefs = Seq(("a", "b"), ("a", "b"), ("b", "c"), ("b", "c"),
      ("a", "c"), ("a", "c")).toDF("w", "l")
    val out = Scoring.bradleyTerry(prefs, "w", "l", iters = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Int]("rank") == 1)
    assert(out("b").getAs[Int]("rank") == 2)
    assert(out("c").getAs[Int]("rank") == 3)
    assert(out("a").getAs[Long]("wins") == 4 &&
      out("a").getAs[Long]("games") == 4)
    // hand-replay iteration 1 for a: D = (2*1e6 div 2000)*2 = 2000;
    // p1(a) = 4e6 div 2000 = 2000. b: wins 2, D = 2000 → 1000.
    // c: wins 0 → 0.
    // iteration 2: a: opp b p=1000, opp c p=0 →
    //   D = 2e6 div 3000 + 2e6 div 2000 = 666+1000 = 1666
    //   p2(a) = 4e6 div 1666 = 2400
    assert(out("a").getAs[Long]("strength_milli") == 2400L)
    assert(out("c").getAs[Long]("strength_milli") == 0L)
  }

  test("bradleyTerry: zero-win candidate never nulls the recurrence") {
    val prefs = Seq(("a", "b"), ("a", "c")).toDF("w", "l")
    val out = Scoring.bradleyTerry(prefs, "w", "l", iters = 3)
      .collect().map(r => r.getString(0) ->
        r.getAs[Long]("strength_milli")).toMap
    assert(out("b") == 0L && out("c") == 0L && out("a") > 0L)
  }

  test("decayWeights: alpha=1/2 gives exact halving ppb table") {
    assert(Scoring.decayWeights(4, 500) ==
      Seq(500000000L, 250000000L, 125000000L, 62500000L))
  }

  test("decayedScore: newest event gets the largest weight; " +
      "only the last k count") {
    val ev = Seq(
      (7L, "2026-01-01 10:00:00", 1L, 100L),
      (7L, "2026-01-01 11:00:00", 2L, 100L),
      (7L, "2026-01-01 12:00:00", 3L, 100L), // newest
    ).toDF("user_id", "ts_s", "event_id", "cents")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"),
        $"event_id", $"cents")
    val out = Scoring.decayedScore(ev, "user_id", "ts", "event_id",
        "cents", k = 2, alphaPermille = 500)
      .collect()(0)
    assert(out.getAs[Long]("n_used") == 2) // k=2 < 3 events
    // 100*5e8 (newest) + 100*2.5e8 = 7.5e10
    assert(out.getAs[Long]("decayed_num") == 75000000000L)
    assert(out.getAs[Long]("decayed_milli") == 75000L)
  }

  test("giniConcentration: uniform → 0, fully concentrated → (n-1)/n") {
    val uniform = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))
      .toDF("id", "v")
    assert(Scoring.giniConcentration(uniform, "v", "id")
      .collect()(0).getAs[Long]("gini_ppm") == 0L)
    val conc = Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 100L))
      .toDF("id", "v")
    // G = (2*4*100 - 5*100) / (4*100) = 300/400 → 750000 ppm
    assert(Scoring.giniConcentration(conc, "v", "id")
      .collect()(0).getAs[Long]("gini_ppm") == 750000L)
    // zero-total → null (undefined, not zero)
    val zero = Seq(("a", 0L)).toDF("id", "v")
    val r = Scoring.giniConcentration(zero, "v", "id").collect()(0)
    assert(r.isNullAt(r.fieldIndex("gini_ppm")))
  }

  test("chiSquareCells: perfect association and zero-observed cells") {
    // perfectly associated 2×2: x↔p, y↔q, 2 rows each
    val df = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a", "b")
    val out = Scoring.chiSquareCells(df, "a", "b")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 4) // full cross product incl. zero cells
    // cell (x,p): O=2, n=4, r=c=2 → (8-4)²/(4·2·2) = 1 → 1e6 ppm
    assert(out(("x", "p")).getAs[Long]("chi2_ppm") == 1000000L)
    // zero cell (x,q): O=0 → (0-4)²/(16) = 1 → 1e6 ppm
    assert(out(("x", "q")).getAs[Long]("observed") == 0L)
    assert(out(("x", "q")).getAs[Long]("chi2_ppm") == 1000000L)
    // total χ² = 4e6 ppm = 4.0 = n — the 2×2 perfect-association value
    assert(out.values.map(_.getAs[Long]("chi2_ppm")).sum == 4000000L)
    assert(out(("x", "p")).getAs[Long]("expected_milli") == 1000L)
  }

  test("decayedScore / giniConcentration: null ts/value rows drop " +
      "before ranking — counts stay consistent with sums") {
    import spark.implicits._
    // u1: a null-value event is newer than everything — it must NOT
    // consume the k=2 recency slot (else the real newest event slides
    // to weight rank 2 and one real event falls out entirely)
    val ev = Seq(
      ("u1", Some(3L), 30L, None: Option[Long]),
      ("u1", Some(2L), 20L, Some(100L)),
      ("u1", Some(1L), 10L, Some(200L)),
      ("u1", None: Option[Long], 5L, Some(900L)),
    ).toDF("k", "ts", "tie", "v")
    val ds = Scoring.decayedScore(ev, "k", "ts", "tie", "v",
      k = 2, alphaPermille = 500).collect().head
    assert(ds.getAs[Long]("n_used") == 2L)
    // weights (α=.5, k=2): 500000000, 250000000 ppb over values 100, 200
    assert(ds.getAs[Long]("decayed_num") ==
      100L * 500000000L + 200L * 250000000L)
    // gini: the null size must not take the lowest rank
    val g = Scoring.giniConcentration(
      Seq((Some(5L), "a"), (None: Option[Long], "b"), (Some(5L), "c"))
        .toDF("size", "id"),
      "size", "id").collect().head
    assert(g.getAs[Long]("n") == 2L)
    assert(g.getAs[Long]("gini_ppm") == 0L) // uniform over the 2 real rows
  }

  test("bradleyTerry: null-sided and self-game judgments drop instead " +
      "of collapsing into phantom pairs") {
    import spark.implicits._
    // least/greatest skip nulls, so without the guard (null, A) would
    // become the self-pair (A, A) and inflate A's games
    val prefs = Seq(
      (Some("A"), Some("B")), (Some("A"), Some("B")),
      (None: Option[String], Some("A")), (Some("B"), None),
      (Some("A"), Some("A")),
    ).toDF("w", "l")
    val out = Scoring.bradleyTerry(prefs, "w", "l")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("A", "B"))
    assert(out("A").getAs[Long]("wins") == 2L)
    assert(out("A").getAs[Long]("games") == 2L)
    assert(out("B").getAs[Long]("games") == 2L)
    assert(out("A").getAs[Int]("rank") == 1)
  }
}
