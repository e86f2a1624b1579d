package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inference-style statistics over distributed data: Welch's unequal-
  * variance t-test, the Benford first-digit audit, and series
  * autocorrelation — all in the repo's exact-sufficient-statistics
  * discipline (see [[SketchStats.groupedOls]]): every aggregation is
  * an exact BIGINT/decimal sum (order-independent, map-side
  * combinable), and each emitted double is ONE fixed-shape IEEE
  * formula over those exact sums, so results are bit-identical across
  * engines and across cluster sizes. `sqrt` is IEEE-correctly-rounded
  * everywhere, so it is safe in final formulas (unlike `ln`/`exp`,
  * whose last ulp is libm-specific — the same reasoning as
  * [[TextAnalysis.collocations]]' factored-out log).
  */
object SeriesStats {

  /** Welch's two-sample t-test per group (the A/B-test statistic for
    * unequal variances, with the Welch–Satterthwaite dof).
    *
    * Scale shape: one hash aggregation of (group, side) partial sums
    * — six exact numbers per side — then a tiny per-group formula.
    * No window, no sort, no second scan; at 100 TB this is the
    * minimal one-shuffle plan.
    *
    * @param df        input rows
    * @param groupCol  experiment/metric key (one test per value)
    * @param sideCol   boolean-ish column: false/0 = side A, true/1 = B
    * @param centsCol  BIGINT measurement in fixed-point hundredths
    *                  (exact; the caller converts doubles via
    *                  decimal(18,2), never via double math).
    *                  OVERFLOW BOUND: the squared sums q_a/q_b
    *                  accumulate x² in BIGINT, so per group
    *                  n · max(|cents|)² must stay below 2⁶³ ≈ 9.2e18 —
    *                  e.g. 10⁹ rows of values up to $30k (3e6 cents →
    *                  9e12 each) fit, but values ≥ ~$10M overflow at
    *                  any n (ANSI mode raises rather than corrupts).
    *                  Past the bound, lift the sums to DECIMAL(38,0)
    *                  before calling — the same escape hatch
    *                  [[RankStats.spearman]] documents for its 4n³.
    * @return per group: n_a, n_b, mean/var per side (value units),
    *         t_stat, dof — groups need >= 2 samples per side.
    */
  def welchTTest(df: DataFrame, groupCol: String, sideCol: String,
      centsCol: String): DataFrame = {
    val g = col(groupCol)
    val b = col(sideCol).cast("boolean")
    val x = col(centsCol)
    df.groupBy(g)
      .agg(
        count(when(!b, 1)).as("n_a"),
        coalesce(sum(when(!b, x)), lit(0L)).as("s_a"),
        coalesce(sum(when(!b, x * x)), lit(0L)).as("q_a"),
        count(when(b, 1)).as("n_b"),
        coalesce(sum(when(b, x)), lit(0L)).as("s_b"),
        coalesce(sum(when(b, x * x)), lit(0L)).as("q_b"),
      )
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      // each formula is written ONCE as SQL text shared verbatim with
      // the DuckDB oracle — op order (and so every last ulp) is pinned
      // by construction.
      .withColumn("mean_a", expr(MeanSql("s_a", "n_a")))
      .withColumn("mean_b", expr(MeanSql("s_b", "n_b")))
      .withColumn("var_a", expr(VarSql("s_a", "q_a", "n_a")))
      .withColumn("var_b", expr(VarSql("s_b", "q_b", "n_b")))
      .withColumn("se2", expr("var_a / n_a + var_b / n_b"))
      .withColumn("t_stat", expr("(mean_a - mean_b) / sqrt(se2)"))
      .withColumn("dof", expr(
        """se2 * se2 / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
          | + (var_b / n_b) * (var_b / n_b) / (n_b - 1))""".stripMargin))
      .drop("s_a", "q_a", "s_b", "q_b", "se2")
  }

  /** One-way ANOVA F — the k-group generalization of [[welchTTest]]'s
    * two-group comparison (equal-variance pooled form; Fisher 1925):
    * does ANY group mean differ? The screening test a pipeline runs
    * across k sources/segments before pairwise follow-ups.
    *
    * Scale shape: one hash aggregation to per-group exact sufficient
    * sums (n_i, Σx, Σx² in BIGINT cents — map-side combinable), plus
    * one global Σx² row. The between-group term Σ s_i²/n_i needs a
    * Σ over GROUPS of per-group IEEE divisions — order-dependent in
    * doubles — so it folds over the SORTED group axis via one
    * `aggregate()` HOF (the [[cusumInt]] bounded-axis convention: the
    * group axis is small even when the fact table is 100 TB), in
    * ascending group-key order that the DuckDB oracle replays with a
    * recursive CTE. Every double is derived from exact BIGINT sums at
    * a pinned point, so F is bit-identical across engines.
    *
    * Overflow: q accumulates x² like [[welchTTest]] — same
    * n · max(|cents|)² < 2⁶³ bound, same DECIMAL(38,0) escape hatch.
    *
    * @param groupCol BIGINT-castable group key (its sort order is part
    *                 of the cross-engine contract)
    * @return one row: k, n, ss_between, ss_within (value units²),
    *         df1 = k−1, df2 = n−k, f_stat */
  def oneWayAnovaF(df: DataFrame, groupCol: String,
      centsCol: String): DataFrame = {
    val g = df.select(col(groupCol).cast("long").as("g"),
        col(centsCol).cast("long").as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_i"), sum(col("x")).as("s_i"),
        sum(col("x") * col("x")).as("q_i"))
    g.agg(sort_array(collect_list(struct(col("g"), col("n_i"),
        col("s_i"), col("q_i")))).as("gs"))
      .select(
        size(col("gs")).cast("long").as("k"),
        expr("aggregate(gs, CAST(0 AS BIGINT), (a, e) -> a + e.n_i)")
          .as("n"),
        expr("aggregate(gs, CAST(0 AS BIGINT), (a, e) -> a + e.s_i)")
          .as("s"),
        expr("aggregate(gs, CAST(0 AS BIGINT), (a, e) -> a + e.q_i)")
          .as("q"),
        // Σ s_i²/n_i folded in ascending group order (exact-rational
        // inputs, pinned double op order)
        expr("""aggregate(gs, CAST(0 AS DOUBLE), (a, e) ->
               |  a + CAST(e.s_i AS DOUBLE) * CAST(e.s_i AS DOUBLE)
               |        / e.n_i)""".stripMargin).as("a_term"))
      .filter(col("k") >= 2 && col("n") > col("k"))
      // cents² → value units²: /100² exactly once per SS term
      .withColumn("ss_between", expr(
        "(a_term - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / 10000.0"))
      .withColumn("ss_within",
        expr("(CAST(q AS DOUBLE) - a_term) / 10000.0"))
      .withColumn("df1", col("k") - lit(1L))
      .withColumn("df2", col("n") - col("k"))
      .withColumn("f_stat",
        expr("(ss_between / df1) / (ss_within / df2)"))
      .select("k", "n", "ss_between", "ss_within", "df1", "df2", "f_stat")
  }

  /** The four SPRT integer constants in MICRO-NATS (floor(1e6·ln ·)):
    * per-success / per-failure log-likelihood-ratio increments and the
    * Wald decision bounds ln((1−β)/α), ln(β/(1−α)). Computed with
    * StrictMath.log — fdlibm-specified, bit-identical on every JVM —
    * so an oracle can embed the SAME integers as literals and a unit
    * test can pin them (q319 does both). */
  def sprtConstants(p0Pm: Int, p1Pm: Int, alphaPm: Int,
      betaPm: Int): (Long, Long, Long, Long) = {
    require(p0Pm > 0 && p0Pm < 1000 && p1Pm > 0 && p1Pm < 1000
      && p0Pm != p1Pm, s"need distinct p0/p1 in (0,1000) pm")
    require(alphaPm > 0 && alphaPm < 1000 && betaPm > 0 && betaPm < 1000,
      "alpha/beta must be in (0,1000) pm")
    def mn(x: Double): Long = math.floor(1e6 * StrictMath.log(x)).toLong
    val ls = mn(p1Pm.toDouble / p0Pm)
    val lf = mn((1000.0 - p1Pm) / (1000.0 - p0Pm))
    val upper = mn((1000.0 - betaPm) / alphaPm)
    val lower = mn(betaPm.toDouble / (1000.0 - alphaPm))
    (ls, lf, upper, lower)
  }

  /** Wald's SEQUENTIAL PROBABILITY RATIO TEST over a Bernoulli stream
    * aggregated to a time axis (Wald 1945) — the always-valid
    * sequential A/B decision: stop as soon as the cumulative
    * log-likelihood ratio leaves (ln(β/(1−α)), ln((1−β)/α)), instead
    * of fixing n in advance. Everything integer: per-step increments
    * and bounds are the [[sprtConstants]] micro-nat floors, the
    * cumulative walk is a BIGINT prefix sum, so every crossing (and
    * THE decision step) is bit-identical in any engine.
    *
    * Scale shape: one hash aggregation of (t, n, n_succ) — the 100-TB
    * work — then a cumulative window over the BOUNDED time axis (the
    * q260 day-axis convention; the axis is small even when the event
    * table is not). For an unbounded axis use [[sprtBernoulliScan]]:
    * identical rows (parity-tested), prefix sum distributed with the
    * [[PrefixScan]] two-pass shape; crossing detection is a filter
    * either way.
    *
    * @param successCol boolean-ish: the Bernoulli outcome
    * @return per t: n_trials, n_success, llr_cum_micro,
    *         crossed ('h1'|'h0'|null — where the walk sits that step),
    *         is_decision (true on the FIRST crossing step only) */
  def sprtBernoulli(events: DataFrame, tCol: String, successCol: String,
      p0Pm: Int, p1Pm: Int, alphaPm: Int = 50,
      betaPm: Int = 50): DataFrame = {
    val (ls, lf, upper, lower) =
      sprtConstants(p0Pm, p1Pm, alphaPm, betaPm)
    import org.apache.spark.sql.expressions.Window
    // bounded-axis cumulative window (single partition over the time
    // axis only — the q260 convention, never over raw events)
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = sprtDaily(events, tCol, successCol)
      .withColumn("llr_cum_micro",
        sum(col("n_success") * lit(ls)
          + (col("n_trials") - col("n_success")) * lit(lf)).over(w))
    sprtDecide(walked, upper, lower)
  }

  /** [[sprtBernoulli]] for an UNBOUNDED time axis — identical rows
    * (parity-tested in InferenceStatsSpec), no single-partition
    * window: the cumulative log-likelihood walk is one BIGINT
    * [[PrefixScan]] sum monoid over the aggregated (t, n_trials,
    * n_success) axis (t is unique after the aggregation, so the order
    * is total), and the decision step is the same filter + broadcast
    * join. Prefer [[sprtBernoulli]] when the axis is known-bounded
    * (one window over a day axis is cheaper and is the form the
    * DuckDB oracle restates); this is the 100-TB path when it isn't.
    */
  def sprtBernoulliScan(events: DataFrame, tCol: String,
      successCol: String, p0Pm: Int, p1Pm: Int, alphaPm: Int = 50,
      betaPm: Int = 50, numPartitions: Int = 0): DataFrame = {
    val (ls, lf, upper, lower) =
      sprtConstants(p0Pm, p1Pm, alphaPm, betaPm)
    import org.apache.spark.sql.types.{LongType, StructField}
    val walked = PrefixScan.scan[Long](
      sprtDaily(events, tCol, successCol), Seq(col("t")),
      Seq(StructField("llr_cum_micro", LongType, nullable = false)),
      new PrefixScan.ScanMonoid[Long] {
        def stepCols: Seq[String] = Seq("n_trials", "n_success")
        def zero: Long = 0L
        def step(s: Long, v: Array[Any]): Long = {
          val nt = v(0).asInstanceOf[Long]
          val ns = v(1).asInstanceOf[Long]
          s + ns * ls + (nt - ns) * lf
        }
        def combine(a: Long, b: Long): Long = a + b
        def emit(post: Long, v: Array[Any]): Seq[Any] = Seq(post)
      }, numPartitions)
    sprtDecide(walked, upper, lower)
  }

  /** Shared SPRT input shaping: the (t, n_trials, n_success) axis. */
  private def sprtDaily(events: DataFrame, tCol: String,
      successCol: String): DataFrame = events
    .select(col(tCol).cast("long").as("t"),
      col(successCol).cast("boolean").cast("long").as("__s"))
    .groupBy(col("t"))
    .agg(count(lit(1)).as("n_trials"), sum(col("__s")).as("n_success"))

  /** Shared SPRT decision tail: crossing labels + the FIRST-crossing
    * flag (one filtered min + broadcast join — never a second scan of
    * the walk). */
  private def sprtDecide(walked: DataFrame, upper: Long,
      lower: Long): DataFrame = {
    val labeled = walked.withColumn("crossed",
      when(col("llr_cum_micro") >= upper, "h1")
        .when(col("llr_cum_micro") <= lower, "h0"))
    val firstCross = labeled.filter(col("crossed").isNotNull)
      .agg(min(col("t")).as("__dt"))
    labeled.crossJoin(broadcast(firstCross))
      .withColumn("is_decision",
        col("__dt").isNotNull && col("t") === col("__dt"))
      .select("t", "n_trials", "n_success", "llr_cum_micro", "crossed",
        "is_decision")
  }

  /** mean in value units from a cents sum: shared Spark/DuckDB text. */
  def MeanSql(s: String, n: String): String =
    s"CAST($s AS DOUBLE) / ($n * 100.0)"

  /** unbiased sample variance in value units² from exact cents sums:
    * (Q - S²/n) / (n-1) / 100². Shared Spark/DuckDB text. */
  def VarSql(s: String, q: String, n: String): String =
    s"(CAST($q AS DOUBLE) - CAST($s AS DOUBLE) * CAST($s AS DOUBLE)" +
      s" / $n) / ($n - 1) / 10000.0"

  /** Benford's-law first-digit audit of a positive money column — the
    * classic fraud/data-quality screen. Emits one row per leading
    * digit 1–9 with the observed count, observed fraction, the Benford
    * expectation log10(1+1/d) (embedded as shortest-round-trip DOUBLE
    * literals — both engines parse decimal literals to the same
    * nearest double; computing log10 at runtime would be libm-ulp-
    * dependent), and the chi-square contribution.
    *
    * The digit is taken from the decimal string of the value's exact
    * cents (first character) — a string cast of a BIGINT, identical in
    * any engine, with no float formatting involved.
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = BenfordP.toSeq.toDF("digit", "p_benford")
    val digits = df
      .select(expr(s"CAST(CAST($valueCol AS DECIMAL(18,2)) * 100" +
        " AS BIGINT)").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(sum(col("n_obs")).as("n_total"))
    broadcast(expected)
      .join(digits, Seq("digit"), "left")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(total))
      .withColumn("frac_obs", expr("CAST(n_obs AS DOUBLE) / n_total"))
      .withColumn("chisq_term", expr(
        "(n_obs - n_total * p_benford) * (n_obs - n_total * p_benford)" +
          " / (n_total * p_benford)"))
      .select("digit", "n_obs", "n_total", "frac_obs", "p_benford",
        "chisq_term")
  }

  /** log10(1+1/d) for d=1..9, shortest-round-trip literals (python
    * repr of math.log10). The SQL mirror embeds the same strings. */
  val BenfordP: Seq[(Int, Double)] = Seq(
    1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
    3 -> 0.12493873660829992, 4 -> 0.09691001300805642,
    5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
    7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
    9 -> 0.04575749056067514)

  /** Autocorrelation of an integer-valued series at lags 1..maxLag,
    * gap-aware (a pair only exists when both t and t+k are present).
    *
    * @param series one row per integer time index: (tCol, xCol) with
    *               xCol BIGINT (caller pre-aggregates to the time
    *               axis, e.g. daily whole-dollar revenue — the axis
    *               is small even when the raw table is 100 TB)
    * @return per lag k: n_pairs and acf_k computed with the global-
    *         mean/global-variance normalization (the standard
    *         stationary estimator): every Σ exact BIGINT, one final
    *         IEEE formula.
    */
  def autocorrelation(series: DataFrame, tCol: String, xCol: String,
      maxLag: Int): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    val s = series.select(col(tCol).cast("long").as("t"),
      col(xCol).cast("long").as("x"))
    val glob = s.agg(count(lit(1)).as("n"), sum(col("x")).as("sx_all"),
      sum(col("x") * col("x")).as("qx_all"))
    val lags = (1 to maxLag).toDF("lag")
    // one self-equi-join on the (tiny) time axis covers all lags: the
    // left side fans out to (t + k, k) probes.
    val probes = s.crossJoin(broadcast(lags))
      .select((col("t") + col("lag")).as("t"), col("lag"),
        col("x").as("x_lhs"))
    val paired = probes.join(s, Seq("t"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x_lhs") * col("x")).as("sxy"),
        sum(col("x_lhs")).as("sx"),
        sum(col("x")).as("sy"))
    paired.crossJoin(broadcast(glob))
      .withColumn("mean_all", expr("CAST(sx_all AS DOUBLE) / n"))
      .withColumn("acf", expr(
        """(CAST(sxy AS DOUBLE) - mean_all * (sx + sy)
          | + CAST(n_pairs AS DOUBLE) * mean_all * mean_all)
          | / (CAST(qx_all AS DOUBLE)
          |    - CAST(sx_all AS DOUBLE) * CAST(sx_all AS DOUBLE) / n)"""
          .stripMargin))
      .select(col("lag"), col("n_pairs"), col("acf"))
  }

  /** Two-sided CUSUM changepoint detector over an integer series,
    * INTEGER-EXACT: deviations are scaled by n (e_i = n·x_i − total)
    * so the reference level never becomes a float mean, and the
    * allowance/threshold are floor-divisions of the integer mean —
    * every accumulator is BIGINT, so alarms are bit-identical in any
    * engine (a float-mean CUSUM would flip boundary days).
    *
    * The recursion S⁺_i = max(0, S⁺_{i-1} + e_i − nk) resets at 0 and
    * is therefore NOT a prefix sum — it needs an ordered fold. The
    * series here is a pre-aggregated time axis (days), tiny relative
    * to the fact table, so the fold is one `aggregate()` HOF over the
    * sorted axis; the 100-TB work (building the axis) stays a
    * distributed hash aggregation. The DuckDB oracle replays the same
    * recursion with a sequential recursive CTE.
    *
    * @param kDiv allowance k = mean div kDiv (slack per step)
    * @param hDiv alarm threshold h = mean div hDiv
    * @return per t: x, s_pos, s_neg (scaled by n), alarm_hi/alarm_lo
    */
  def cusumInt(series: DataFrame, tCol: String, xCol: String,
      kDiv: Int, hDiv: Int): DataFrame = {
    require(kDiv > 0 && hDiv > 0, "kDiv/hDiv must be positive")
    val s = series.select(col(tCol).cast("long").as("t"),
      col(xCol).cast("long").as("x"))
    val g = s.agg(count(lit(1)).as("n"), sum(col("x")).as("total"))
    s.crossJoin(broadcast(g))
      .select(col("t"), col("x"),
        (col("n") * col("x") - col("total")).as("e"),
        expr(s"n * ((total div n) div $kDiv)").as("nk"),
        expr(s"n * ((total div n) div $hDiv)").as("nh"))
      .agg(sort_array(collect_list(struct(col("t"), col("x"), col("e"),
        col("nk"), col("nh")))).as("pts"))
      .select(explode(expr(
        """aggregate(pts,
          |  struct(CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sn,
          |    CAST(array() AS ARRAY<STRUCT<t: BIGINT, x: BIGINT,
          |      sp: BIGINT, sn: BIGINT, nh: BIGINT>>) AS out),
          |  (acc, e) -> struct(
          |    greatest(CAST(0 AS BIGINT), acc.sp + e.e - e.nk) AS sp,
          |    least(CAST(0 AS BIGINT), acc.sn + e.e + e.nk) AS sn,
          |    array_append(acc.out, struct(e.t AS t, e.x AS x,
          |      greatest(CAST(0 AS BIGINT), acc.sp + e.e - e.nk) AS sp,
          |      least(CAST(0 AS BIGINT), acc.sn + e.e + e.nk) AS sn,
          |      e.nh AS nh)) AS out),
          |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col("r.t").as("t"), col("r.x").as("x"),
        col("r.sp").as("s_pos"), col("r.sn").as("s_neg"),
        (col("r.sp") > col("r.nh")).as("alarm_hi"),
        (col("r.sn") < -col("r.nh")).as("alarm_lo"))
  }

  /** [[cusumInt]] for UNBOUNDED series — identical rows (parity-tested,
    * CorpusOpsSpec + q260's day axis), no `collect_list` array. The
    * clamped recursions have closed forms as running extrema of plain
    * prefix sums (with P_0 = P'_0 = 0):
    *
    *   S⁺_i = max(0, S⁺_{i-1} + e_i − nk) = P_i  − min_{0≤j≤i} P_j,
    *     P_i  = Σ_{j≤i} (e_j − nk)
    *   S⁻_i = min(0, S⁻_{i-1} + e_i + nk) = P'_i − max_{0≤j≤i} P'_j,
    *     P'_i = Σ_{j≤i} (e_j + nk)
    *
    * (unroll: S⁺_i = max_{0≤j≤i} (P_i − P_j) — the clamp at 0 IS the
    * j = i term, and a reset at step j is exactly "the running min was
    * attained at j"). Prefix sums and their running extrema form a
    * [[PrefixScan]] monoid (r10 — this was the third hand-rolled copy
    * of the two-pass shape): per-partition summaries are FOUR scalars
    * (Σa, min-prefix(a), Σb, max-prefix(b)), the driver folds P of
    * them into incoming states — metadata, not data — and pass 2
    * streams each partition once with four BIGINTs of state. Same exact
    * integer arithmetic as [[cusumInt]], so alarms stay bit-identical;
    * the only cost over the bounded form is one extra scan of the
    * (t, x) axis. Prefer [[cusumInt]] when the axis is known-bounded
    * (its single `aggregate()` fold is cheaper and is the form the
    * DuckDB oracle restates); this is the 100-TB path when it isn't.
    */
  def cusumIntScan(series: DataFrame, tCol: String, xCol: String,
      kDiv: Int, hDiv: Int, numPartitions: Int = 0): DataFrame = {
    require(kDiv > 0 && hDiv > 0, "kDiv/hDiv must be positive")
    import org.apache.spark.sql.types.{BooleanType, LongType, StructField}
    val s = series.select(col(tCol).cast("long").as("t"),
      col(xCol).cast("long").as("x"))
    val g = s.agg(count(lit(1)).as("n"), sum(col("x")).as("total"))
    val base = s.crossJoin(broadcast(g))
      .select(col("t"), col("x"),
        (col("n") * col("x") - col("total")).as("e"),
        expr(s"n * ((total div n) div $kDiv)").as("nk"),
        expr(s"n * ((total div n) div $hDiv)").as("nh"))
    // [[PrefixScan]] monoid: state = (prefix A, running min-prefix A,
    // prefix B, running max-prefix B) with a = e − nk, b = e + nk; the
    // extrema include P₀ = 0 via the zero state. Ordered by (t, x),
    // not t alone: with duplicate t values a t-only order would leave
    // tied rows' mutual order (and the running prefix AT them)
    // nondeterministic vs cusumInt's full-struct sort — equal (t, x)
    // rows carry identical e/nk (e is a function of x; nk/nh are
    // constants), so (t, x) restores bit-exact parity on ANY axis.
    val scanned = PrefixScan.scan[(Long, Long, Long, Long)](
      base, Seq(col("t"), col("x")),
      Seq(StructField("s_pos", LongType, nullable = false),
        StructField("s_neg", LongType, nullable = false),
        StructField("alarm_hi", BooleanType, nullable = false),
        StructField("alarm_lo", BooleanType, nullable = false)),
      new PrefixScan.ScanMonoid[(Long, Long, Long, Long)] {
        def stepCols: Seq[String] = Seq("e", "nk")
        override def emitCols: Seq[String] = Seq("nh")
        def zero: (Long, Long, Long, Long) = (0L, 0L, 0L, 0L)
        def step(st: (Long, Long, Long, Long),
            v: Array[Any]): (Long, Long, Long, Long) = {
          val e = v(0).asInstanceOf[Long]; val nk = v(1).asInstanceOf[Long]
          val pa = st._1 + (e - nk); val pb = st._3 + (e + nk)
          (pa, math.min(st._2, pa), pb, math.max(st._4, pb))
        }
        def combine(a: (Long, Long, Long, Long),
            b: (Long, Long, Long, Long)): (Long, Long, Long, Long) =
          (a._1 + b._1, math.min(a._2, a._1 + b._2),
            a._3 + b._3, math.max(a._4, a._3 + b._4))
        def emit(post: (Long, Long, Long, Long),
            v: Array[Any]): Seq[Any] = {
          val nh = v(2).asInstanceOf[Long]
          val sp = post._1 - post._2 // ≥ 0 by construction (min ≤ pa)
          val sn = post._3 - post._4 // ≤ 0 by construction
          Seq(sp, sn, sp > nh, sn < -nh)
        }
      }, numPartitions)
    scanned.select("t", "x", "s_pos", "s_neg", "alarm_hi", "alarm_lo")
  }

  /** Per-key integer EWMA: s_1 = x_1, s_i = s_{i-1} +
    * (x_i − s_{i-1}) div `den` with sign-symmetric truncation (Spark
    * `div` truncates toward zero, DuckDB `//` floors — the guarded
    * form makes both engines agree on negative deltas, the same
    * divergence [[TemporalJoins.interpolateLinear]] guards).
    *
    * Scale shape: the fold runs per key via one `aggregate()` HOF over
    * the key's sorted event array — keys fan out across the cluster,
    * per-key state is one BIGINT, and a hot key degrades to a
    * sequential scan, not a shuffle explosion. Exact integers end to
    * end: any engine replaying the recursion gets identical rows.
    *
    * @param orderCols total per-key order (include a unique tiebreak)
    * @return keyCol, rn (1-based per key), order columns, x, ewma
    */
  def ewmaInt(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valCol: String, den: Int): DataFrame = {
    require(den >= 2, "den must be >= 2 (den=1 is the identity)")
    val ordStruct = struct(orderCols.map(col) :+
      col(valCol).cast("long").as("__x"): _*)
    df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(ordStruct)).as("evs"))
      .select(col(keyCol), explode(expr(
        s"""aggregate(evs,
           |  struct(CAST(0 AS BIGINT) AS s, CAST(0 AS INT) AS rn,
           |    CAST(array() AS ARRAY<STRUCT<rn: INT, x: BIGINT,
           |      ewma: BIGINT>>) AS out),
           |  (acc, e) -> struct(
           |    CASE WHEN acc.rn = 0 THEN e.__x
           |      WHEN e.__x - acc.s >= 0
           |        THEN acc.s + (e.__x - acc.s) div $den
           |      ELSE acc.s - ((acc.s - e.__x) div $den)
           |    END AS s,
           |    acc.rn + 1 AS rn,
           |    array_append(acc.out, struct(acc.rn + 1 AS rn,
           |      e.__x AS x,
           |      CASE WHEN acc.rn = 0 THEN e.__x
           |        WHEN e.__x - acc.s >= 0
             |        THEN acc.s + (e.__x - acc.s) div $den
           |        ELSE acc.s - ((acc.s - e.__x) div $den)
           |      END AS ewma)) AS out),
           |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col(keyCol), col("r.rn").as("rn"), col("r.x").as("x"),
        col("r.ewma").as("ewma"))
  }

  /** Per-key integer Holt linear (double-exponential) smoothing —
    * [[ewmaInt]]'s recursion extended with a trend term, so a ramping
    * series forecasts the ramp instead of lagging it:
    *
    *   l_1 = x_1, b_1 = 0, f_1 = x_1
    *   f_i = l_{i−1} + b_{i−1}                       (one-step forecast)
    *   l_i = f_i + sdiv(x_i − f_i, denL)             (level update)
    *   b_i = b_{i−1} + sdiv(l_i − l_{i−1} − b_{i−1}, denT)
    *
    * where sdiv is the sign-symmetric truncating division both engines
    * agree on (Spark `div` truncates, DuckDB `//` floors — guarded
    * exactly as [[ewmaInt]] does; trend deltas are routinely negative,
    * so the guard is live here, not defensive).
    *
    * Scale shape: identical to [[ewmaInt]] — one `aggregate()` fold
    * over each key's sorted event array; per-key state is two BIGINTs;
    * keys fan out, a hot key degrades to a sequential scan. Exact
    * integers end to end.
    *
    * @return keyCol, rn (1-based), x, level, trend, forecast */
  def holtInt(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valCol: String, denL: Int, denT: Int): DataFrame = {
    require(denL >= 2 && denT >= 2, "denL/denT must be >= 2")
    def sdiv(a: String, d: Int): String =
      s"(CASE WHEN ($a) >= 0 THEN ($a) div $d ELSE -((-($a)) div $d) END)"
    val f = "(acc.l + acc.b)"
    val lNew = s"($f + ${sdiv(s"e.__x - $f", denL)})"
    val bNew = s"(acc.b + ${sdiv(s"$lNew - acc.l - acc.b", denT)})"
    val ordStruct = struct(orderCols.map(col) :+
      col(valCol).cast("long").as("__x"): _*)
    df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(ordStruct)).as("evs"))
      .select(col(keyCol), explode(expr(
        s"""aggregate(evs,
           |  struct(CAST(0 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
           |    CAST(0 AS INT) AS rn,
           |    CAST(array() AS ARRAY<STRUCT<rn: INT, x: BIGINT,
           |      level: BIGINT, trend: BIGINT, forecast: BIGINT>>) AS out),
           |  (acc, e) -> struct(
           |    CASE WHEN acc.rn = 0 THEN e.__x ELSE $lNew END AS l,
           |    CASE WHEN acc.rn = 0 THEN CAST(0 AS BIGINT)
           |      ELSE $bNew END AS b,
           |    acc.rn + 1 AS rn,
           |    array_append(acc.out, struct(acc.rn + 1 AS rn,
           |      e.__x AS x,
           |      CASE WHEN acc.rn = 0 THEN e.__x ELSE $lNew END AS level,
           |      CASE WHEN acc.rn = 0 THEN CAST(0 AS BIGINT)
           |        ELSE $bNew END AS trend,
           |      CASE WHEN acc.rn = 0 THEN e.__x ELSE $f END
           |        AS forecast)) AS out),
           |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col(keyCol), col("r.rn").as("rn"), col("r.x").as("x"),
        col("r.level").as("level"), col("r.trend").as("trend"),
        col("r.forecast").as("forecast"))
  }
}
