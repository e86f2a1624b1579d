package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
