package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis: the Kaplan–Meier product-limit estimator with
  * right-censoring (Kaplan & Meier 1958), plus the Nelson–Aalen-style
  * per-timepoint hazard.
  *
  * Scale shape: the per-subject table (potentially billions of rows)
  * is reduced to one row per DISTINCT duration by a distributed
  * hash aggregation — everything after that operates on the tiny
  * timepoint axis (days/weeks: thousands of rows at most, independent
  * of subject count). The at-risk counts n(t) = |{duration >= t}| are
  * a suffix sum over that axis (one window over the already-tiny
  * frame), never a per-subject range join.
  *
  * Determinism (hash-stable across engines): the survival curve is a
  * running PRODUCT of factors (n-d)/n — floating multiplication is
  * order-sensitive in the last ulp, so the fold order is pinned:
  * factors are exact-BIGINT-derived doubles (one IEEE division each)
  * multiplied serially in ascending-time order via an `aggregate()`
  * HOF over the sorted timepoint array. A DuckDB oracle restates the
  * same serial fold with `list_reduce(list(f ORDER BY t), ...)`
  * (windowed `product()` would NOT match: DuckDB evaluates running
  * window aggregates with a segment tree, whose multiplication order
  * diverges from a serial fold — measured, not assumed).
  */
object Survival {

  /** Kaplan–Meier curve from one row per subject.
    *
    * @param df    one row per subject
    * @param tCol  integer duration (e.g. days); must be non-negative
    * @param evCol 1 = event observed at t, 0 = right-censored at t
    *              (censored subjects count as at-risk at their own t,
    *              the standard convention)
    * @return one row per distinct OBSERVED-event time: t, n_risk,
    *         d_events, hazard = d/n (double), survival = running
    *         product of (n-d)/n (double, serial ascending-t fold)
    */
  def kaplanMeier(df: DataFrame, tCol: String, evCol: String): DataFrame = {
    val perT = df.groupBy(col(tCol).cast("long").as("t"))
      .agg(count(lit(1)).as("c_all"),
        sum(col(evCol).cast("long")).as("d_events"))
    // at-risk = subjects with duration >= t: suffix sum on the tiny
    // timepoint axis (single window partition is fine — the frame is
    // |distinct t|, not |subjects|).
    val risk = perT
      .withColumn("n_risk",
        sum(col("c_all")).over(Window.orderBy(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("d_events") > 0)
      .select(col("t"), col("n_risk"), col("d_events"),
        ((col("n_risk") - col("d_events")).cast("double") / col("n_risk"))
          .as("f"))
    // serial ascending-t product fold: collect the (tiny) axis into
    // one sorted array, accumulate the running survival by appending
    // (the last element's running value) * f — a left fold whose
    // multiplication order is the spec, reproducible in any engine.
    risk
      .agg(sort_array(collect_list(struct(col("t"), col("n_risk"),
        col("d_events"), col("f")))).as("pts"))
      .select(explode(expr(
        """aggregate(pts,
          |  struct(CAST(1.0 AS DOUBLE) AS s,
          |    CAST(array() AS ARRAY<STRUCT<t: BIGINT, n_risk: BIGINT,
          |                                 d_events: BIGINT, s: DOUBLE>>)
          |      AS out),
          |  (acc, e) -> struct(acc.s * e.f AS s,
          |    array_append(acc.out, struct(
          |      e.t AS t, e.n_risk AS n_risk, e.d_events AS d_events,
          |      acc.s * e.f AS s)) AS out),
          |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col("r.t").as("t"),
        col("r.n_risk").as("n_risk"),
        col("r.d_events").as("d_events"),
        (col("r.d_events").cast("double") / col("r.n_risk"))
          .as("hazard"),
        col("r.s").as("survival"))
  }
}
