package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch-based corpus statistics with a driver-gated accuracy check.
  *
  * At 100 TB, `count(DISTINCT …)` and exact percentiles are the two
  * stats that stop being computable the naive way: exact distinct
  * needs a full shuffle of every distinct value, and an exact
  * percentile needs a global sort. The production shapes are
  * HyperLogLog++ (`approx_count_distinct`, mergeable 1.5 KB sketch per
  * partition) and the Greenwald–Khanna/KLL-style quantile sketch
  * (`approx_percentile`) — both single-pass, both map-side combined,
  * both deterministic for a fixed input (no RNG in either sketch), so
  * the gate below is stable run to run.
  *
  * [[statsGate]] computes BOTH the sketch and the exact answer and
  * emits one row per statistic with a `within` tolerance verdict — the
  * same driver-gating pattern as the ANN recall floors (q56): the
  * oracle restates the exact values and `within=true`, so a sketch
  * regression (or a Spark upgrade changing sketch internals beyond
  * tolerance) fails the gate loudly. The exact twin is affordable at
  * test scale only; production runs keep just the sketch side.
  *
  * Quantile verdicts gate on achieved RANK, not value: the fraction of
  * rows ≤ the sketch's answer must sit within `rankTol` of the asked
  * quantile. A value-space gate would need an exact percentile (the
  * very computation the sketch exists to avoid) and breaks on skewed
  * value distributions; rank error is exactly what the GK sketch
  * bounds (ε = 1/accuracy).
  */
object SketchStats {

  /** One row per statistic: (stat, exact, within).
    *
    * @param distinctCols gate `approx_count_distinct(c, rsd)` against
    *                     exact `count(DISTINCT c)`, |err| ≤ distinctTol·exact
    *  @param quantCol    numeric column for percentile gating
    *  @param qs          quantiles in (0,1) to gate
    */
  def statsGate(df: DataFrame, distinctCols: Seq[String], quantCol: String,
      qs: Seq[Double], rsd: Double = 0.02, accuracy: Int = 10000,
      distinctTol: Double = 0.05, rankTol: Double = 0.01): DataFrame = {
    require(distinctCols.nonEmpty && qs.nonEmpty)
    // pass 1 — sketches only (the production pass): one row of HLL
    // estimates + the quantile-sketch answers
    val sketchAggs =
      distinctCols.map(c => approx_count_distinct(col(c), rsd).as(s"__a_$c")) :+
        approx_percentile(col(quantCol).cast("double"),
          array(qs.map(lit): _*), lit(accuracy)).as("__apq")
    val sketch = df.agg(sketchAggs.head, sketchAggs.tail: _*)
    // pass 2 — exact twins + achieved ranks, with the 1-row sketch
    // frame broadcast onto the scan (no driver collect). GLOBAL
    // aggregation with first() carrying the sketch columns through: the
    // r4 shape grouped by the sketch columns themselves, and grouping on
    // an array key (__apq) falls out of hash aggregation — a global agg
    // keeps the map-side partial-combine path (q69: 9.05 s → ~2 s).
    val exactAggs =
      distinctCols.map(c => first(col(s"__a_$c")).as(s"__a_$c")) ++
        Seq(first(col("__apq")).as("__apq")) ++
        distinctCols.map(c => count_distinct(col(c)).as(s"__d_$c")) ++
        qs.indices.map(i => sum(when(col(quantCol).cast("double") <=
          element_at(col("__apq"), i + 1), 1L).otherwise(0L)).as(s"__le_$i")) ++
        Seq(count(when(col(quantCol).isNotNull, 1)).as("__n"),
          count(lit(1)).as("__rows"))
    // an empty input yields ZERO gate rows (matching the pre-global-agg
    // grouped form), not one row of null-sketch/zero-count verdicts —
    // the global agg always emits a row, so filter it back out
    val gates = df.crossJoin(broadcast(sketch))
      .agg(exactAggs.head, exactAggs.tail: _*)
      .filter(col("__rows") > 0)
    val rows =
      distinctCols.map { c =>
        val err = abs(col(s"__a_$c") - col(s"__d_$c")).cast("double")
        struct(lit(s"distinct_$c").as("stat"), col(s"__d_$c").as("exact"),
          (err <= col(s"__d_$c") * distinctTol).as("within"))
      } ++ qs.zipWithIndex.map { case (q, i) =>
        val frac = col(s"__le_$i").cast("double") / col("__n")
        struct(lit(f"p${math.round(q * 100)}%02d_$quantCol").as("stat"),
          lit(null).cast("bigint").as("exact"),
          (abs(frac - q) <= rankTol).as("within"))
      }
    gates.select(explode(array(rows: _*)).as("__s")).select(col("__s.*"))
  }

  /** ONE-PASS histogram quantile sketch with a verified error
    * contract: a fixed equi-width binning (width from an exact
    * min/max/count pre-scan) approximates each requested permille
    * quantile by its bin's bounds — the mergeable, bounded-state
    * summary that serves dashboard quantiles at 100 TB where the
    * multi-round exact selection ([[exactQuantilesLong]]) costs ≤7
    * scans. The output CARRIES the contract: each row joins the true
    * rank-r value (two-pass [[Packing.globalRowNumber]], no global
    * window) and a `within_bound` flag that is true by construction —
    * an oracle recomputing the same integer bins must agree on every
    * column, and a binning bug flips the flag loudly.
    *
    * All-integer: rank = ceil(p·n/1000) in integer arithmetic
    * ((p·n+999) div 1000 — an IEEE ceil(p·n) would disagree with a
    * rational oracle when p·n parses inexactly, e.g. 0.007·1000), bin
    * edges are exact longs, so any engine reproduces every row.
    *
    * @param psPermille quantiles as permille integers (1..1000)
    * @return p_permille, r (1-based target rank), est_lo/est_hi (the
    *         selected bin's inclusive bounds), exact (true rank-r
    *         value), within_bound
    */
  def histQuantileSketch(df: DataFrame, valueCol: String, nBins: Int,
      psPermille: Seq[Int]): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    require(psPermille.nonEmpty &&
      psPermille.forall(p => p >= 1 && p <= 1000),
      "permille quantiles must be in [1, 1000]")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
    val g = v.agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
      count(lit(1)).as("n"))
    val withW = broadcast(g
      .withColumn("w", expr(s"(mx - mn) div $nBins + 1")))
    val cum = v.crossJoin(withW)
      .groupBy(expr("(v - mn) div w").as("bin"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c"))
        .over(Window.orderBy(col("bin").asc))) // tiny bin axis
    val targets = psPermille.toDF("p_permille")
      .crossJoin(withW)
      .withColumn("r", expr("(p_permille * n + 999) div 1000"))
    val sel = targets.join(cum, col("cum") >= col("r"))
      .groupBy(col("p_permille"), col("r"), col("mn"), col("w"))
      .agg(min(col("bin")).as("bin"))
      .select(col("p_permille"), col("r"),
        (col("mn") + col("bin") * col("w")).as("est_lo"),
        (col("mn") + (col("bin") + lit(1)) * col("w") - 1).as("est_hi"))
    val ranked = Packing.globalRowNumber(v, Seq(col("v").asc), "rn")
    sel.join(ranked, col("rn") === col("r") - 1)
      .select(col("p_permille"), col("r"), col("est_lo"), col("est_hi"),
        col("v").as("exact"),
        col("v").between(col("est_lo"), col("est_hi"))
          .as("within_bound"))
  }

  /** EXACT percentiles WITHOUT a global sort — iterative histogram-
    * refinement selection, the scale-correct way to get an exact p50 /
    * p99 when the sketch gate above isn't enough (SLA reporting, split
    * thresholds that must reproduce). Each round histograms the
    * candidate value range into ≤ 2^maxBucketsLog2 power-of-two-wide
    * buckets (bucket = (v − lo) >> shift — exact integer math, no
    * double division), locates the bucket holding the target rank, and
    * recurses into it: the range shrinks 1024× per pass, so a full
    * 64-bit domain resolves in ≤ 7 scans and realistic domains
    * (lengths, counts, timestamps) in 2–3. All requested quantiles
    * share each scan (one conditional-struct explode into a map-side-
    * combined count); only |ps|·1024 count rows reach the driver per
    * round.
    *
    * Rank convention: value at row_number ceil(p·n) of the ascending
    * sort (ties inherit the shared value) — p·n evaluated in IEEE
    * double on BOTH sides, so the rank an oracle derives from the same
    * literal p is identical even where p·n rounds across an integer.
    *
    * The single-column frame is materialized once so every refinement
    * round observes the same rows; at extreme scale swap the
    * materialization for parquet re-scans of the pruned column if
    * checkpoint storage is the bottleneck.
    *
    * @param ps quantiles in (0, 1]; @return (p double, value long)
    */
  def exactQuantilesLong(df: DataFrame, valueCol: String,
      ps: Seq[Double], maxBucketsLog2: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    exactQuantileStates(
      df.select(lit("").as("__g"), col(valueCol).cast("long").as("__v")),
      ps, maxBucketsLog2)
      .map(s => (s.p, s.lo)).toDF("p", "value")
  }

  /** Per-GROUP exact percentiles — the same histogram-refinement
    * selection run for every (group, p) pair at once: one scan per
    * refinement round serves ALL groups' all quantiles (each row
    * contributes to its own group's active ranges only), so the pass
    * count stays ≤ ~7 regardless of group count. Driver state is
    * (groups·|ps|) scalars — usable at dashboard cardinality (sources,
    * languages), guarded at 10⁴ states; unbounded-cardinality keys
    * want the sketch gate above instead.
    *
    * @return (groupCol string, p double, value long)
    */
  def exactQuantilesLongByGroup(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Double],
      maxBucketsLog2: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val states = exactQuantileStates(
      df.select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("long").as("__v")),
      ps, maxBucketsLog2)
    states.map(s => (s.g, s.p, s.lo)).toDF(groupCol, "p", "value")
  }

  private final class QState(val g: String, val p: Double, var lo: Long,
    var hi: Long, var k: Long, var done: Boolean)

  /** The shared refinement loop over a (__g string, __v long) frame;
    * returns one resolved state per (group, p). Null values are
    * excluded; a NULL group is a group (matched with `<=>` so it never
    * silently vanishes through an equi-predicate). */
  private def exactQuantileStates(gv: DataFrame, ps: Seq[Double],
      maxBucketsLog2: Int): Seq[QState] = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantiles must be in (0, 1]: $ps")
    require(maxBucketsLog2 >= 1 && maxBucketsLog2 <= 20,
      s"maxBucketsLog2 must be in [1, 20], got $maxBucketsLog2")
    import graft.ops.Materialize.MaterializeOps
    val base = gv.filter(col("__v").isNotNull).materialized
    val heads = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"))
      .collect() // one row per group — bounded-cardinality contract
    require(heads.length * ps.size <= 10000,
      s"${heads.length} groups × ${ps.size} quantiles exceeds the " +
        "10k driver-state guard; use statsGate for high-cardinality keys")
    val states = heads.toSeq.flatMap { r =>
      val (g, n, lo0, hi0) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      require(BigInt(hi0) - BigInt(lo0) < (BigInt(1) << 62),
        s"value range [$lo0, $hi0] too wide for exact selection")
      ps.map(p => new QState(g, p, lo0, hi0,
        math.max(1L, math.ceil(p * n).toLong), false))
    }
    while (states.exists(s => !s.done)) {
      states.foreach(s => if (!s.done && s.lo == s.hi) s.done = true)
      val active = states.filterNot(_.done)
      if (active.nonEmpty) {
        val specs = active.map { s =>
          val bits = (BigInt(s.hi) - BigInt(s.lo)).bitLength
          (s, math.max(0, bits - maxBucketsLog2))
        }
        val contribs = specs.zipWithIndex.map { case ((s, sh), i) =>
          when(col("__g") <=> lit(s.g) &&
              col("__v") >= s.lo && col("__v") <= s.hi,
            struct(lit(i).as("qi"),
              shiftright(col("__v") - s.lo, sh).as("b")))
            .otherwise(lit(null))
        }
        val hist = base.select(explode(array(contribs: _*)).as("__c"))
          .filter(col("__c").isNotNull)
          .groupBy(col("__c.qi").as("qi"), col("__c.b").as("b"))
          .agg(count(lit(1)).as("cnt"))
          .collect() // ≤ states·2^maxBucketsLog2 rows — model-sized
          .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
        specs.zipWithIndex.foreach { case ((s, sh), i) =>
          var cum = 0L
          var b = 0L
          var found = false
          while (!found) {
            val c = hist.getOrElse((i, b), 0L)
            if (cum + c >= s.k) {
              if (sh == 0) { // single-value buckets: resolved
                s.lo += b; s.hi = s.lo; s.done = true
              } else {
                s.k -= cum
                val newLo = s.lo + (b << sh)
                s.hi = math.min(s.hi, newLo + (1L << sh) - 1)
                s.lo = newLo
              }
              found = true
            } else { cum += c; b += 1 }
          }
        }
      }
    }
    states
  }

  /** GLOBAL NTILE — equi-depth bucket assignment over a total order,
    * without the single-partition window a naive
    * `ntile(k) OVER (ORDER BY …)` plans (the r5 scale-killer class):
    * the global rank comes from [[Packing.globalRowNumber]]'s two-pass
    * range-partitioned scan, the total count is one aggregate, and the
    * tile is pure integer math replaying SQL NTILE's contract exactly
    * (first `n mod k` tiles get `ceil(n/k)` rows, the rest
    * `floor(n/k)`). Ties must be broken by a unique key in `order` or
    * two engines may disagree on boundary rows — same rule as every
    * rank consumer here.
    *
    * @return input columns + (outCol int tile in [1, k]) */
  def globalNtile(df: DataFrame, order: Seq[Column], k: Int,
      outCol: String = "tile"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ranked = Packing.globalRowNumber(df, order, "__r")
    val total = ranked.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(total))
      // integer `div` throughout — Spark's `/` on Columns is ALWAYS
      // double division, a silent fraction bug in tile math
      .withColumn(outCol, expr(
        s"""CAST(CASE
           |  WHEN __r < (__n % $k) * ((__n div $k) + 1)
           |    THEN __r div ((__n div $k) + 1) + 1
           |  ELSE (__n % $k)
           |    + (__r - (__n % $k) * ((__n div $k) + 1)) div (__n div $k)
           |    + 1
           |END AS INT)""".stripMargin))
      .drop("__r", "__n")
  }

  /** Exact-integer-sum → DOUBLE through an explicit 2^32 hi/lo split,
    * NOT the engine-native big-decimal cast: once a sum crosses 2^53
    * (measured: Σprice_cents² ≈ 2.2e19 on the sf0.1 sweep) the native
    * conversions disagree by 1 ulp across engines. hi and lo are both
    * exactly representable doubles, so the only roundings left are one
    * IEEE multiply and one IEEE add — correctly rounded and therefore
    * bit-identical everywhere; DuckDB twins replay the same split
    * (`CAST(abs(x) AS HUGEINT) // 2^32`, `% 2^32` — DuckDB's `//` on
    * DECIMAL goes through DOUBLE, hence the HUGEINT hop). Valid to
    * ~2^85, i.e. any realistic corpus. This is the bridge every
    * operator here uses when an IEEE value (r, slope) is the output
    * contract but the inputs are exact integer sufficient statistics. */
  private[ops] def splitToDouble(c: String): Column = {
    val hi = expr(s"abs($c) div 4294967296").cast("double")
    val lo = (abs(col(c)) % lit(4294967296L)).cast("double")
    when(col(c) < 0, -1.0).otherwise(1.0) *
      (hi * lit(4294967296.0) + lo)
  }

  /** Per-group ORDINARY LEAST SQUARES (slope + intercept) from exact
    * sufficient statistics: Σx, Σy, Σxy, Σx² accumulate in scale-0
    * decimal (order-free exact addition — double sums differ in the
    * last ulp between Spark's aggregation tree and a serial engine),
    * and only the final closed-form division runs in IEEE double, a
    * fixed expression any engine replays bit-for-bit. INPUTS MUST BE
    * INTEGER-SCALED (cents, micro-units — see the in-body note on why
    * fractional decimal scales break cross-engine double casts);
    * slope/intercept come back in the scaled units and the caller
    * divides once. Groups with < 2 points or zero x-variance yield
    * null slope (the formula is undefined, not zero). Rows with a
    * null x or y are dropped as PAIRS before counting (the
    * SQL-standard regr_* semantic — see the in-body note). Precision
    * envelope: |x|,|y| < ~10⁹ scaled units keeps Σx·y sums inside
    * decimal(38,0) to ~10¹⁹ rows.
    *
    * Scale shape: one map-side-combined aggregation; |groups| rows out.
    *
    * @return (groupCol, n, slope, intercept) */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    // INTEGER-SCALED inputs by contract (cents, micro-units — the
    // caller pre-scales; slope is scale-covariant and r-style ratios
    // are scale-invariant, so natural units come back with one final
    // division). Why scale 0: a decimal with fractional scale reaches
    // DOUBLE through value/10^s — DuckDB evaluates that as int128→
    // double THEN the division, a double rounding that really is off
    // by 1 ulp on this testdata (Σx² = 51213411 exactly arrived as
    // …411.00000001) — while a scale-0 decimal needs no division, and
    // [[splitToDouble]] makes even its int→double step engine-exact
    // past 2^53. decimal(19,0) operands keep the product path in
    // int128 on the DuckDB side too.
    val x = col(xCol).cast("decimal(19,0)")
    val y = col(yCol).cast("decimal(19,0)")
    // complete-case: a null x or y must drop the whole PAIR before n is
    // counted — `sum` skips nulls but `count(lit(1))` would not, and an
    // n inconsistent with its sums silently skews the fit (the
    // SQL-standard regr_* aggregates define exactly this pair-drop)
    val agg = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"))
    // exact integer sums → double once (via the deterministic split —
    // per-group sums are usually well under 2^53, but the operator
    // contract shouldn't hinge on group size), then a fixed IEEE
    // formula both engines replay operation-for-operation
    val nD = col("n").cast("double")
    def d(c: String) = splitToDouble(c)
    agg
      .withColumn("__den", nD * d("__sxx") - d("__sx") * d("__sx"))
      .withColumn("slope",
        when(col("n") >= 2 && col("__den") =!= 0.0,
          (nD * d("__sxy") - d("__sx") * d("__sy")) / col("__den")))
      .withColumn("intercept",
        when(col("slope").isNotNull,
          (d("__sy") - col("slope") * d("__sx")) / nD))
      .select(col(groupCol), col("n"), col("slope"), col("intercept"))
  }

  /** PEARSON CORRELATION for every pair of the given numeric columns —
    * the feature-correlation matrix of a data-quality report, via the
    * same integer-scaled exact sufficient statistics as [[groupedOls]]
    * (callers pre-scale to whole units — r is scale-invariant so
    * nothing comes back to convert; ONE
    * scan accumulates all pairs' sums; `corr()` built-ins stream
    * doubles and lose cross-engine bit equality). The final
    * r = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) runs in IEEE
    * double with correctly-rounded sqrt — deterministic everywhere.
    * Zero-variance columns yield null r. Rows with a null in ANY of
    * the given columns are dropped (listwise deletion — the one
    * shared n must be consistent with every pair's sums).
    *
    * @return (var_a, var_b, n, r) for a < b in the given order */
  def pearsonPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got $cols")
    // same integer-scaled / final-double discipline as groupedOls —
    // Pearson r is scale-invariant, so pre-scaling costs nothing
    val dec = cols.map(c => col(c).cast("decimal(19,0)"))
    val aggs = cols.indices.flatMap { i =>
      Seq(sum(dec(i)).as(s"__s$i"),
        sum(dec(i) * dec(i)).as(s"__q$i")) } ++
      cols.indices.flatMap { i => cols.indices.drop(i + 1).map { j =>
        sum(dec(i) * dec(j)).as(s"__p${i}_$j") } }
    // listwise deletion: one shared n must be consistent with EVERY
    // pair's sums, so any null in any correlated column drops the row
    // before counting (pairwise-complete semantics would need a
    // per-pair n and break the one-scan shape; callers wanting it run
    // per-pair). Without this, nulls skew r silently — sum skips them,
    // count(lit(1)) would not.
    val complete = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    val stats = complete.agg(count(lit(1)).as("__n"), aggs: _*)
    val nD = col("__n").cast("double")
    def d(c: String) = splitToDouble(c)
    val pairRows = cols.indices.flatMap { i =>
      cols.indices.drop(i + 1).map { j =>
        val vx = nD * d(s"__q$i") - d(s"__s$i") * d(s"__s$i")
        val vy = nD * d(s"__q$j") - d(s"__s$j") * d(s"__s$j")
        val cov = nD * d(s"__p${i}_$j") - d(s"__s$i") * d(s"__s$j")
        struct(lit(cols(i)).as("var_a"), lit(cols(j)).as("var_b"),
          col("__n").as("n"),
          when(vx > 0.0 && vy > 0.0,
            cov / (sqrt(vx) * sqrt(vy))).as("r"))
      } }
    stats.select(explode(array(pairRows: _*)).as("__pr"))
      .select(col("__pr.var_a").as("var_a"), col("__pr.var_b").as("var_b"),
        col("__pr.n").as("n"), col("__pr.r").as("r"))
  }

  /** Per-group Shannon entropy of a categorical mix, in DETERMINISTIC
    * milli-nats: H = ln(n) − (Σ_c cnt_c·ln cnt_c)/n, with every ln
    * floored to an integer milli-nat BEFORE summation
    * (floor(1000·ln x) — the q88-vocab convention), so the sum is
    * order-free BIGINT and any engine replays it bit-exactly; the one
    * libm call reaches the hash compare only through the floor. The
    * systematic error is < 1 milli-nat per category — a measurement
    * convention, not an approximation of record.
    *
    * The mix-diversity gate every curation pipeline wants (is this
    * user/source/shard dominated by one category?): 0 = pure,
    * ln(k)·1000 = uniform over k categories.
    *
    * Scale shape: two hash aggregations, the second group-sized.
    *
    * @return (groupCol, n, h_milli) */
  def groupEntropyMilli(df: DataFrame, groupCol: String,
      catCol: String): DataFrame = {
    df.groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n"),
        sum(col("__c") *
          floor(lit(1000.0) * log(col("__c").cast("double")))
            .cast("long")).as("__t"))
      .select(col(groupCol), col("n"),
        (floor(lit(1000.0) * log(col("n").cast("double"))).cast("long")
          - expr("__t div n")).as("h_milli"))
  }

  /** WEIGHTED exact quantiles: the smallest value whose cumulative
    * weight reaches ceil(p·W) — token-weighted length percentiles,
    * byte-weighted latency percentiles, anywhere "half the TOKENS"
    * matters instead of "half the DOCUMENTS".
    *
    * Scale shape: per-distinct-value weight sums (one hash agg), then
    * ONE [[PrefixScan]] sum monoid over the value axis for the
    * cumulative weights (r11 — this was the fifth and last hand-rolled
    * copy of the two-pass range-shuffle shape the primitive was
    * extracted to own). Rows with w ≤ 0 are dropped (zero-weight rows
    * cannot move a weighted rank; negative weights have no quantile
    * meaning).
    *
    * Rank convention mirrors [[exactQuantilesLong]]: target = ceil(p·W)
    * with p·W evaluated in IEEE double on both sides.
    *
    * @return one row per p: (p double, value long) */
  def weightedQuantilesLong(df: DataFrame, valCol: String,
      weightCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantiles must be in (0, 1]: $ps")
    val spark = df.sparkSession
    import spark.implicits._
    import graft.ops.Materialize.MaterializeOps
    import org.apache.spark.sql.types.{LongType, StructField}
    // materialized HERE (not just inside scan) so the total-weight agg
    // below reads the checkpointed frame instead of re-running the
    // upstream hash agg
    val perValue = df
      .select(col(valCol).cast("long").as("__v"),
        col(weightCol).cast("long").as("__w"))
      .filter(col("__w") > 0)
      .groupBy(col("__v")).agg(sum(col("__w")).as("__wv"))
      .materialized
    val total = perValue.agg(sum(col("__wv"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    require(total > 0, "no positive-weight rows")
    val cum = PrefixScan.scan[Long](perValue, Seq(col("__v")),
      Seq(StructField("__cum", LongType, nullable = false)),
      new PrefixScan.ScanMonoid[Long] {
        def stepCols: Seq[String] = Seq("__wv")
        def zero: Long = 0L
        def step(s: Long, v: Array[Any]): Long =
          s + v(0).asInstanceOf[Long]
        def combine(a: Long, b: Long): Long = a + b
        def emit(post: Long, v: Array[Any]): Seq[Any] = Seq(post)
      })
    val targets = ps.map(pp =>
      (pp, math.ceil(pp * total.toDouble).toLong))
      .toDF("p", "__target")
    cum.crossJoin(broadcast(targets))
      .filter(col("__cum") >= col("__target"))
      .groupBy(col("p")).agg(min(col("__v")).as("value"))
  }

  /** Count–Min point-frequency gate: build ONE mergeable CMS over a
    * long key column with Spark's built-in `count_min_sketch` aggregate
    * (map-side partial sketches union in the combiner — the 100-TB
    * shape: a KB-sized summary answers per-key frequency for ANY key,
    * where [[HeavyHitters]]' Misra–Gries tracks only the top k), then
    * verify its two deterministic guarantees on the exact top-k keys:
    * estimates never undercount, and overcount is bounded by ε·N
    * (ε = eps, N = total rows; fixed seed makes both booleans stable
    * across runs, so the oracle restates them alongside exact counts —
    * the q69/q269 sketch-gate convention).
    *
    * The sketch binary is collected once (model-sized: d·w counters)
    * and estimates run through a closure over the exact top-k rows
    * only — k rows through a scalar function, not a data-path UDF.
    *
    * @return top-k by exact count: (key, exact_n, overest_ok, bound_ok) */
  def cmsPointGate(df: DataFrame, keyCol: String, k: Int,
      eps: Double, conf: Double, seed: Int): DataFrame = {
    require(k >= 1 && eps > 0 && conf > 0 && conf < 1,
      s"bad cms params k=$k eps=$eps conf=$conf")
    val keyed = df.select(col(keyCol).cast("long").as("__k"))
    val skRow = keyed.agg(
      expr(s"count_min_sketch(__k, CAST($eps AS DOUBLE), " +
        s"CAST($conf AS DOUBLE), $seed)").as("sk"),
      count(lit(1)).as("n")).head()
    val skBytes = skRow.getAs[Array[Byte]](0)
    val total = skRow.getLong(1)
    val bound = math.ceil(eps * total).toLong
    val estimate = udf { (key: Long) =>
      // deserialize per call is fine: called k (= model-sized) times
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(skBytes))
        .estimateCount(key)
    }
    import graft.ops.Materialize.MaterializeOps
    // materialize the top-k BEFORE the estimate projection: with the
    // UDF project in between, Catalyst cannot fuse sort+limit into
    // TakeOrderedAndProject and plans a GLOBAL range sort of every
    // distinct key instead (measured; asserted in ScaleOpsSpec)
    val topk = keyed.groupBy(col("__k")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("__k").asc)
      .limit(k)
      .materialized
    topk.withColumn("__est", estimate(col("__k")))
      .select(col("__k").as(keyCol), col("exact_n"),
        (col("__est") >= col("exact_n")).as("overest_ok"),
        (col("__est") <= col("exact_n") + lit(bound)).as("bound_ok"))
  }
}
