package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-based (non-parametric) statistics with integer-exact rank
  * arithmetic: Mann–Whitney U and Spearman correlation.
  *
  * Ties use AVERAGE ranks, kept integer by DOUBLING them:
  * `2·avgrank = 2·minrank + cnt − 1` where `minrank` is the 1-based
  * min-rank of the tied value and `cnt` its multiplicity — so every
  * rank sum is exact BIGINT and any engine replaying the definition
  * hashes identically; only the final test statistic touches IEEE
  * doubles, computed from the exact sums with formula text shared
  * verbatim with the oracle (the [[SketchStats.groupedOls]] /
  * Welch-t convention).
  *
  * Scale shape: global min-ranks ride [[Packing.globalRowNumber]]'s
  * two-pass range-partitioned scan (never a single-partition window);
  * per-value multiplicities are one hash aggregation on the value; the
  * join back to rows is value-keyed. Everything downstream of ranking
  * is map-side-combinable sufficient sums.
  */
object RankStats {

  /** Per-row doubled average rank of `valCol` (ascending), appended as
    * `outCol`: 2·minrank + cnt − 1, BIGINT. `uidCol` breaks row-number
    * ties inside equal values — it affects nothing observable (min-rank
    * per value is order-independent) but makes the underlying scan
    * deterministic. */
  def avgRankX2(df: DataFrame, valCol: String, uidCol: String,
      outCol: String): DataFrame = {
    val rn = Packing.globalRowNumber(df,
      Seq(col(valCol).asc, col(uidCol).asc), "__rn")
    val perValue = rn.groupBy(col(valCol).as("__v"))
      .agg(min(col("__rn")).as("__minrn"), count(lit(1)).as("__cnt"))
    rn.join(perValue, col(valCol) === col("__v"))
      // minrank 1-based = __minrn + 1 (globalRowNumber is 0-based)
      .withColumn(outCol,
        lit(2L) * (col("__minrn") + lit(1L)) + col("__cnt") - lit(1L))
      .drop("__rn", "__v", "__minrn", "__cnt")
  }

  /** Mann–Whitney U (doubled, tie-averaged): one row per group with
    * n, the doubled rank sum R·2, and U·2 = R·2 − n(n+1). The caller's
    * test decision compares min(U) against its critical value; both
    * groups' rows are emitted so the identity U1 + U2 = n1·n2 is
    * checkable downstream. Exactly two distinct groups required. */
  def mannWhitneyUx2(df: DataFrame, grpCol: String, valCol: String,
      uidCol: String): DataFrame = {
    val ranked = avgRankX2(
      df.select(col(grpCol), col(valCol).cast("long").as(valCol),
        col(uidCol)),
      valCol, uidCol, "__rx2")
    val perGroup = ranked.groupBy(col(grpCol))
      .agg(count(lit(1)).as("n"), sum(col("__rx2")).as("r_x2"))
    val sizes = perGroup.agg(count(lit(1)).as("k")).head().getLong(0)
    require(sizes == 2L, s"need exactly 2 groups, got $sizes")
    perGroup.select(col(grpCol), col("n"), col("r_x2"),
      (col("r_x2") - col("n") * (col("n") + lit(1L))).as("u_x2"))
  }

  /** Exact ROC-AUC via the Mann–Whitney identity (Hanley & McNeil
    * 1982): AUC = U⁺/(n⁺·n⁻), where U⁺ comes from the positives'
    * tie-averaged rank sum — ties get 1/2 credit, the standard exact
    * treatment (equivalent to trapezoidal integration over the tied
    * ROC segment). All rank arithmetic rides the doubled-rank BIGINT
    * discipline above: u_x2 = Σ 2·avgrank(pos) − n⁺(n⁺+1) is exact,
    * and AUC is ONE final division u_x2 / (2·n⁺·n⁻) — bit-identical
    * in any engine that replays the rank definition.
    *
    * Scale shape: inherits [[avgRankX2]]'s two-pass ranked scan (never
    * a single-partition window) + one aggregation — the exact-AUC plan
    * you want when the score table is 100 TB and sampling would bias
    * the tail.
    *
    * @param labelCol 0/1 (castable); both classes must be present
    * @return one row: n_pos, n_neg, u_x2, auc */
  def rocAucExact(df: DataFrame, labelCol: String, scoreCol: String,
      uidCol: String): DataFrame = {
    val ranked = avgRankX2(
      df.select(col(labelCol).cast("long").as("__y"),
        col(scoreCol).cast("long").as("__score"), col(uidCol)),
      "__score", uidCol, "__rx2")
    ranked.agg(
        sum(col("__y")).as("n_pos"),
        sum(lit(1L) - col("__y")).as("n_neg"),
        sum(when(col("__y") === 1L, col("__rx2"))).as("r_x2_pos"))
      .select(col("n_pos"), col("n_neg"),
        (col("r_x2_pos") - col("n_pos") * (col("n_pos") + lit(1L)))
          .as("u_x2"))
      .withColumn("auc", expr(
        "CAST(u_x2 AS DOUBLE) / (2.0 * n_pos * n_neg)"))
  }

  /** Spearman rank correlation over (xCol, yCol): both variables'
    * doubled average ranks, exact BIGINT sufficient sums, and rho as
    * the Pearson formula over the rank sums — every operand cast to
    * double at the same point the oracle casts, so the final IEEE
    * value is bit-identical across engines. Returns one row:
    * n, sx, sy, sxx, syy, sxy (exact), rho (double).
    *
    * Overflow bound: sums of squared doubled ranks grow as 4n³ — exact
    * in BIGINT to n ≈ 1.3M rows; beyond that lift the sums to
    * DECIMAL(38,0) (the formula is unchanged). */
  def spearman(df: DataFrame, xCol: String, yCol: String,
      uidCol: String): DataFrame = {
    val base = df.select(col(xCol).cast("long").as(xCol),
      col(yCol).cast("long").as(yCol), col(uidCol))
    val rx = avgRankX2(base, xCol, uidCol, "rx2")
    val rxy = avgRankX2(rx, yCol, uidCol, "ry2")
    rxy.agg(
        count(lit(1)).as("n"), sum(col("rx2")).as("sx"),
        sum(col("ry2")).as("sy"),
        sum(col("rx2") * col("rx2")).as("sxx"),
        sum(col("ry2") * col("ry2")).as("syy"),
        sum(col("rx2") * col("ry2")).as("sxy"))
      .withColumn("rho", expr(rhoFormula))
  }

  /** Two-sample Kolmogorov–Smirnov statistic, EXACT: D·n1·n2 is an
    * integer — max over values v of |cum1(v)·n2 − cum2(v)·n1| — so no
    * ECDF ever touches floating point and any engine replaying the
    * definition hashes identically. (The caller compares D·n1·n2
    * against c(α)·√(n1·n2·(n1+n2))·… scaled likewise, or divides once
    * at the edge.)
    *
    * Scale shape: one hash aggregation to per-distinct-value group
    * counts, then the cumulative pair-count walk is ONE
    * [[PrefixScan]] (r10 — this was the fourth hand-rolled copy of
    * the two-pass shape) and one max. Never a single-partition
    * window.
    *
    * @return one row: (n1, n2, d_scaled = max|cum1·n2 − cum2·n1|) */
  def ksTestScaled(df: DataFrame, grpCol: String,
      valCol: String): DataFrame = {
    import graft.ops.Materialize.MaterializeOps
    import org.apache.spark.sql.types.{LongType, StructField}
    val groups = df.select(col(grpCol).cast("string").as("__g"))
      .distinct().orderBy(col("__g")).collect().map(_.getString(0))
    require(groups.length == 2,
      s"need exactly 2 groups, got ${groups.length}")
    val (gA, gB) = (groups(0), groups(1))
    val perValue = df.select(col(grpCol).cast("string").as("__g"),
        col(valCol).cast("long").as("__v"))
      .groupBy(col("__v"))
      .agg(sum(when(col("__g") === gA, 1L).otherwise(0L)).as("__c1"),
        sum(when(col("__g") === gB, 1L).otherwise(0L)).as("__c2"))
    // pair-sum monoid over the value axis (__v is distinct after the
    // aggregation, so the order is total); materialized because both
    // the totals row and the final max consume it
    val scanned = PrefixScan.scan[(Long, Long)](perValue,
      Seq(col("__v").asc),
      Seq(StructField("__cum1", LongType, nullable = false),
        StructField("__cum2", LongType, nullable = false)),
      new PrefixScan.ScanMonoid[(Long, Long)] {
        def stepCols: Seq[String] = Seq("__c1", "__c2")
        def zero: (Long, Long) = (0L, 0L)
        def step(s: (Long, Long), v: Array[Any]): (Long, Long) =
          (s._1 + v(0).asInstanceOf[Long], s._2 + v(1).asInstanceOf[Long])
        def combine(a: (Long, Long), b: (Long, Long)): (Long, Long) =
          (a._1 + b._1, a._2 + b._2)
        def emit(post: (Long, Long), v: Array[Any]): Seq[Any] =
          Seq(post._1, post._2)
      }).materialized
    // the cumulative counts are monotone, so the totals are their max
    val tot = scanned.agg(max(col("__cum1")).as("n1"),
      max(col("__cum2")).as("n2"))
    val Seq(n1, n2) = tot.head().toSeq.map(_.asInstanceOf[Long])
    require(n1 > 0 && n2 > 0, s"both groups need rows: n1=$n1 n2=$n2")
    scanned
      .agg(max(abs(col("__cum1") * n2 - col("__cum2") * n1))
        .as("d_scaled"))
      .select(lit(n1).as("n1"), lit(n2).as("n2"), col("d_scaled"))
  }

  /** The shared rho text — identical in Spark and DuckDB (both parse
    * CAST/sqrt the same way), evaluated over the exact BIGINT sums. */
  val rhoFormula: String =
    """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      | / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"""
      .stripMargin
}
