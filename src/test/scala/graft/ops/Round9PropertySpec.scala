package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property tests for the round-9 operators: ROC-AUC's label-flip
  * identity and bounds, calibration-bin conservation, RRF input-order
  * invariance, MMR selection-set containment, funnel monotonicity,
  * and the ANOVA sum-of-squares partition. Randomized with fixed
  * seeds — deterministic, like WavePropertySpec. */
class Round9PropertySpec extends SparkSpec {
  import spark.implicits._

  test("rocAucExact: AUC(y) + AUC(1−y) == 1 (midrank symmetry) and " +
      "AUC ∈ [0,1] on random tied data") {
    val rnd = new scala.util.Random(19)
    val rows = (1L to 300L).map(i =>
      (if (rnd.nextBoolean()) 1L else 0L, rnd.nextInt(20).toLong, i))
    val df = rows.toDF("y", "score", "uid")
    val flipped = rows.map { case (y, s, u) => (1L - y, s, u) }
      .toDF("y", "score", "uid")
    def auc(d: org.apache.spark.sql.DataFrame): Double =
      RankStats.rocAucExact(d, "y", "score", "uid")
        .collect().head.getAs[Double]("auc")
    val a = auc(df)
    val b = auc(flipped)
    assert(a >= 0.0 && a <= 1.0)
    assert(a + b == 1.0) // exact: u_x2 identities make it bit-true
  }

  test("calibrationBins: Σn == rows, Σn_pos == positives, brier and " +
      "gap numerators match a direct fold, bins stay in range") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map { _ =>
      (rnd.nextInt(1000001).toLong, if (rnd.nextBoolean()) 1L else 0L)
    }
    val out = Scoring.calibrationBins(
      rows.toDF("score_micro", "y"), "score_micro", "y").collect()
    assert(out.map(_.getAs[Long]("n")).sum == rows.size)
    assert(out.map(_.getAs[Long]("n_pos")).sum == rows.count(_._2 == 1L))
    assert(out.forall { r =>
      val b = r.getAs[Long]("bin"); b >= 0 && b <= 9 })
    val brier = rows.map { case (s, y) =>
      val d = s - y * 1000000L; d * d }.sum
    assert(out.map(_.getAs[Long]("brier_num")).sum == brier)
    // per-bin gap equals the direct per-bin fold
    val direct = rows.groupBy { case (s, _) => math.min(s * 10 / 1000000, 9) }
      .map { case (b, rs) =>
        b -> math.abs(rs.map(_._1).sum - rs.map(_._2).sum * 1000000L) }
    out.foreach { r =>
      assert(r.getAs[Long]("ece_gap_num") ==
        direct(r.getAs[Long]("bin"))) }
  }

  test("rrfFuse: invariant to input row order and run interleaving") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 200).map { _ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(40).toLong,
        rnd.nextInt(10).toLong + 1) }
      .distinct
    def fused(rs: Seq[(Long, Long, Long)]): Set[(Long, Long, Long, Int)] =
      Fusion.rrfFuse(rs.toDF("q", "doc", "rank"), "q", "doc", "rank")
        .select($"query".cast("long"), $"doc", $"rrf_ppb", $"fused_rank")
        .as[(Long, Long, Long, Int)].collect().toSet
    assert(fused(rows) == fused(rnd.shuffle(rows)))
  }

  test("mmrSelect: selections ⊆ candidates, ranks contiguous from 1, " +
      "no doc selected twice, count == min(k, |cands|)") {
    val rnd = new scala.util.Random(31)
    val cands = (1 to 120).map { i =>
      (i % 7L, i.toLong, rnd.nextInt(1000).toLong) }
    val sims = for {
      q <- 0L until 7L
      a <- cands.filter(_._1 == q).map(_._2)
      b <- cands.filter(_._1 == q).map(_._2) if a < b && rnd.nextBoolean()
    } yield (q, a, b, rnd.nextInt(1000000).toLong)
    val out = Fusion.mmrSelect(cands.toDF("qid", "doc", "rel_micro"),
        sims.toDF("qid", "doc_a", "doc_b", "sim_micro"),
        k = 5, lambdaPermille = 600)
      .as[(Long, Long, Int, Long)].collect()
    val byQ = out.groupBy(_._1)
    val candsByQ = cands.groupBy(_._1)
    byQ.foreach { case (q, sel) =>
      val docs = sel.map(_._2)
      assert(docs.distinct.length == docs.length)
      assert(docs.toSet.subsetOf(candsByQ(q).map(_._2).toSet))
      assert(sel.map(_._3).sorted.toSeq ==
        (1 to math.min(5, candsByQ(q).size)).toSeq)
    }
  }

  test("funnelSteps: reach counts are monotonically non-increasing " +
      "down the funnel on random event streams") {
    val rnd = new scala.util.Random(37)
    val types = Seq("signup", "click", "purchase", "error")
    val ev = (1 to 800).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(1000).toDouble,
        types(rnd.nextInt(types.size))) }
    val out = Behavior.funnelSteps(ev.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", Seq("signup", "click", "purchase"))
      .orderBy($"step_idx").collect().map(_.getAs[Long]("n_reached"))
    assert(out.length == 3)
    assert(out.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("simpsonsReversal: a constructed Berkeley-style reversal flags, " +
      "a consistent dataset does not") {
    // stratum X: A 50/100 vs B 6/10 (B better); stratum Y: A 1/10 vs
    // B 20/100 (B better); pooled: A 51/110 vs B 26/110 (A better)
    def rows(st: String, side: Boolean, succ: Int, fail: Int) =
      Seq.fill(succ)((st, side, true)) ++ Seq.fill(fail)((st, side, false))
    val d = (rows("X", false, 50, 50) ++ rows("X", true, 6, 4) ++
      rows("Y", false, 1, 9) ++ rows("Y", true, 20, 80))
      .toDF("st", "side", "succ")
    val out = Scoring.simpsonsReversal(d, "st", "side", "succ")
      .collect().map(r => r.getAs[String]("stratum") ->
        ((r.getAs[Long]("direction"), r.getAs[Boolean]("reversed"))))
      .toMap
    assert(out("X") == ((-1L, false)) && out("Y") == ((-1L, false)))
    assert(out("__pooled__") == ((1L, true)))
    // same strata but B wins pooled too → no reversal
    val ok = (rows("X", false, 10, 90) ++ rows("X", true, 60, 40) ++
      rows("Y", false, 1, 9) ++ rows("Y", true, 20, 80))
      .toDF("st", "side", "succ")
    val out2 = Scoring.simpsonsReversal(ok, "st", "side", "succ")
      .collect().map(r => r.getAs[String]("stratum") ->
        r.getAs[Boolean]("reversed")).toMap
    assert(!out2("__pooled__"))
  }

  test("tokenJsdMicro: identical slices give exactly 0, disjoint " +
      "vocabularies give exactly ln2 micro, random splits sit between") {
    val a = Seq("x y z", "x x w").toDF("text")
    val same = Scoring.tokenJsdMicro(a, a, "text").collect().head
    assert(same.getAs[Long]("sum_a_term") == 0L)
    assert(same.getAs[Double]("jsd_micro") == 0.0)
    val b = Seq("p q r", "p p s").toDF("text")
    val dis = Scoring.tokenJsdMicro(a, b, "text").collect().head
    assert(dis.getAs[Double]("jsd_micro") == 693147.0) // floor(1e6 ln2)
    assert(dis.getAs[Long]("vocab") == 8L)
    val rnd = new scala.util.Random(43)
    val words = (1 to 200).map(_ => s"w${rnd.nextInt(30)}")
    val docs = words.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val docs2 = rnd.shuffle(words).grouped(10).map(_.mkString(" "))
      .toSeq.toDF("text")
    val mid = Scoring.tokenJsdMicro(docs, docs2, "text").collect().head
      .getAs[Double]("jsd_micro")
    assert(mid >= 0.0 - 1.0 && mid <= 693148.0) // floors can dip ~0⁻
  }

  test("oneWayAnovaF: SSB + SSW == total SS (the ANOVA partition), " +
      "both non-negative, on random groups") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 400).map(_ =>
      (rnd.nextInt(6).toLong + 1, rnd.nextInt(10000).toLong))
    val r = SeriesStats.oneWayAnovaF(rows.toDF("g", "cents"),
      "g", "cents").collect().head
    val ssb = r.getAs[Double]("ss_between")
    val ssw = r.getAs[Double]("ss_within")
    assert(ssb >= 0.0 && ssw >= 0.0)
    // total SS from the raw data (value units²)
    val xs = rows.map(_._2.toDouble / 100.0)
    val mean = xs.sum / xs.size
    val tot = xs.map(x => (x - mean) * (x - mean)).sum
    assert(math.abs(ssb + ssw - tot) < 1e-6 * tot)
  }
}
