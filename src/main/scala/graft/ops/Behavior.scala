package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User-behavior analytics over event streams: ordered funnel
  * conversion and cohort retention — the two standard product-metric
  * queries a pipeline serves next to the attribution join (q72) and
  * sessionization (q75). Both in the exact-integer discipline: counts
  * and per-mille ratios from one or two hash aggregations, no floats
  * anywhere but clearly-derived columns.
  */
object Behavior {

  /** Ordered funnel: how many users reach step i with the steps in
    * temporal ORDER — step i counts only if its earliest qualifying
    * occurrence is STRICTLY after the time step i−1 was reached (the
    * product-analytics "strict ordered funnel"; re-orderings and
    * single-step spam don't inflate depth).
    *
    * Per user the reach times fold left-to-right:
    * t₁ = min ts of step 1; tᵢ = min ts of step i with ts > tᵢ₋₁ —
    * computed in ONE `aggregate()` HOF over the user's sorted events
    * (the [[SeriesStats.ewmaInt]] per-key convention: keys fan out,
    * per-key state is k BIGINTs, a hot user degrades to a sequential
    * scan of its own events, never a shuffle explosion).
    *
    * Hot-user bound: the per-user fold array holds that user's funnel
    * events ONLY, but has no intrinsic cap — a pathological single
    * user (a bot replaying one step millions of times) would build one
    * giant array on one task. `maxPerStep > 0` bounds it to the
    * EARLIEST maxPerStep occurrences per (user, step) via a windowed
    * row_number (streaming sort state, never an array), capping the
    * fold at k·maxPerStep elements per user. The cap is a documented
    * semantic change, not an approximation of the unbounded fold: a
    * user who needs a later-than-maxPerStep-th occurrence of a step to
    * advance (because every earlier one precedes the prior step's
    * reach time) counts as stalled there — "the funnel over each
    * user's earliest maxPerStep occurrences per step", deterministic
    * and restatable. Default 0 = unbounded (exact strict-fold
    * semantics, the [[SeriesStats.ewmaInt]] per-key convention).
    *
    * @param steps event-type sequence defining the funnel (k small,
    *              DISTINCT — a repeated type would make its earlier
    *              step unreachable, so it is rejected loudly)
    * @param maxPerStep 0 = unbounded; >0 keeps the earliest
    *              maxPerStep events per (user, step) before the fold
    * @return one row per step: step_idx (1-based), step, n_reached,
    *         conv_from_prev_pm (1000·n_i div n_{i−1}; 1000 for step 1),
    *         conv_from_first_pm (1000·n_i div n_1) */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxPerStep: Int = 0): DataFrame = {
    require(steps.nonEmpty && steps.size <= 8,
      s"need 1..8 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct event types, got $steps")
    val spark = events.sparkSession
    import spark.implicits._
    val k = steps.size
    val stepIdx = steps.zipWithIndex
      .map { case (s, i) => (i + 1, s) }.toDF("step_idx", "step")
    // per-user sorted (ts_micros, step) fold; only funnel steps ride
    val idxExpr = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    // floor-then-cast: Spark's double→long CAST truncates but DuckDB's
    // ROUNDS — an explicit floor() makes both engines agree (positive
    // epochs), and epoch micros stay inside double's exact-integer range
    val funnelEvents = events
      .select(col(userCol).as("__u"),
        expr(s"CAST(floor(CAST($tsCol AS DOUBLE) * 1000000) AS BIGINT)")
          .as("__t"),
        idxExpr.as("__s"))
      .filter(col("__s") >= 0)
    val bounded =
      if (maxPerStep <= 0) funnelEvents
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__u"), col("__s")).orderBy(col("__t"))
        funnelEvents.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= maxPerStep).drop("__rn")
      }
    val per = bounded
      .groupBy(col("__u"))
      .agg(sort_array(collect_list(struct(col("__t"), col("__s"))))
        .as("evs"))
      // state: reach[k] BIGINT micros, -1 = unreached; an event of step
      // i sets reach[i] iff unreached, i == 0 or reach[i-1] set, and
      // ts strictly after reach[i-1]
      .select(expr(
        s"""aggregate(evs,
           |  array_repeat(CAST(-1 AS BIGINT), $k),
           |  (acc, e) -> transform(acc, (r, i) ->
           |    CASE WHEN i = e.__s AND r = -1
           |           AND (i = 0 OR (acc[i - 1] <> -1
           |                          AND e.__t > acc[i - 1]))
           |      THEN e.__t ELSE r END))""".stripMargin).as("reach"))
    val depth = per.select(posexplode(col("reach")).as(Seq("i", "t")))
      .filter(col("t") =!= -1L)
      .groupBy((col("i") + 1).cast("int").as("step_idx"))
      .agg(count(lit(1)).as("n_reached"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("step_idx")) // k-row frame: bounded-axis exception
    broadcast(stepIdx).join(depth, Seq("step_idx"), "left")
      .na.fill(0L, Seq("n_reached"))
      .withColumn("__prev", lag(col("n_reached"), 1).over(w))
      .withColumn("__first", first(col("n_reached")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .withColumn("conv_from_prev_pm", expr(
        "CASE WHEN __prev IS NULL THEN 1000 WHEN __prev = 0 THEN 0" +
          " ELSE (1000 * n_reached) div __prev END"))
      .withColumn("conv_from_first_pm", expr(
        "CASE WHEN __first = 0 THEN 0" +
          " ELSE (1000 * n_reached) div __first END"))
      .select("step_idx", "step", "n_reached", "conv_from_prev_pm",
        "conv_from_first_pm")
  }

  /** Cohort retention matrix: users grouped by their FIRST-activity
    * period (epoch-day FLOOR-divided by `periodDays` — floor, not
    * truncate, so negative epochs agree with engines whose integer
    * division floors); for each (cohort, offset)
    * the distinct users active `offset` periods later, plus the
    * per-mille retention against the cohort's size.
    *
    * Scale shape: first-activity = one min-aggregation per user; the
    * matrix = one distinct + one hash aggregation on (cohort, offset);
    * cohort sizes join back on the bounded cohort axis. All exact
    * BIGINT — the matrix is restatable by any engine.
    *
    * @return (cohort_period, period_offset, n_active, cohort_size,
    *         retention_pm) for offsets ≥ 0, rows only where active */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    // FLOOR division on both steps: DuckDB's `//` floors while Spark's
    // `div` truncates toward zero — a pre-1970 timestamp (negative
    // epoch day) would land in different periods. floor(floor(x/86400)
    // / p) = floor(x/(86400·p)) (nested-floor identity, p ≥ 1), and
    // the day magnitudes are far inside double's exact-integer range,
    // so the floored double quotient IS the integer floor-div both
    // engines restate.
    val perEvent = events.select(col(userCol).as("__u"),
      expr(s"CAST(floor(floor(CAST(${tsCol} AS DOUBLE) / 86400)" +
        s" / $periodDays) AS BIGINT)").as("__p"))
    val active = perEvent.distinct() // (user, period)
    val firstP = active.groupBy(col("__u"))
      .agg(min(col("__p")).as("__c"))
    val matrix = active.join(firstP, "__u")
      .groupBy(col("__c").as("cohort_period"),
        (col("__p") - col("__c")).as("period_offset"))
      .agg(count(lit(1)).as("n_active")) // distinct by construction
    val sizes = firstP.groupBy(col("__c").as("cohort_period"))
      .agg(count(lit(1)).as("cohort_size"))
    matrix.join(sizes, "cohort_period")
      .withColumn("retention_pm",
        expr("(1000 * n_active) div cohort_size"))
      .select("cohort_period", "period_offset", "n_active",
        "cohort_size", "retention_pm")
  }
}
