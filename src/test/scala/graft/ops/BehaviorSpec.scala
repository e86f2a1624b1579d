package graft.ops

import graft.SparkSpec

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  test("funnelSteps: strict ordering gates depth; same-timestamp step " +
      "does not count; skipped steps block later ones") {
    val ev = Seq(
      // u1 completes the funnel in order
      (1L, 1.0, "signup"), (1L, 2.0, "click"), (1L, 3.0, "purchase"),
      // u2: pre-signup click ignored; click AT signup's ts is not
      // strictly after; later purchase can't count without a click
      (2L, 1.0, "click"), (2L, 2.0, "signup"), (2L, 2.0, "click"),
      (2L, 5.0, "purchase"),
      // u3: signup then purchase but no click → depth 1
      (3L, 1.0, "signup"), (3L, 2.0, "purchase"),
      // u4: never signs up → depth 0
      (4L, 1.0, "click"),
      // noise event types are ignored entirely
      (1L, 0.5, "error"),
    ).toDF("user_id", "ts", "event_type")
    val out = Behavior.funnelSteps(ev, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .collect().map(r => r.getAs[Int]("step_idx") ->
        ((r.getAs[String]("step"), r.getAs[Long]("n_reached"),
          r.getAs[Long]("conv_from_prev_pm"),
          r.getAs[Long]("conv_from_first_pm")))).toMap
    assert(out(1) == (("signup", 3L, 1000L, 1000L)))
    assert(out(2) == (("click", 1L, 333L, 333L)))
    assert(out(3) == (("purchase", 1L, 1000L, 333L)))
  }

  test("cohortRetention: first-activity cohorts, offset counts, exact " +
      "per-mille") {
    val day = 86400.0
    val ev = Seq(
      (1L, 0.0), (1L, 8 * day),   // cohort week 0, active weeks 0 and 1
      (2L, 1 * day),              // cohort week 0, week 0 only
      (3L, 14 * day),             // cohort week 2
      (1L, 2 * day),              // duplicate week-0 activity — distinct
    ).toDF("user_id", "ts")
    val out = Behavior.cohortRetention(ev, "user_id", "ts", periodDays = 7)
      .collect().map(r => (r.getAs[Long]("cohort_period"),
        r.getAs[Long]("period_offset")) ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Long]("retention_pm")))).toMap
    assert(out((0L, 0L)) == ((2L, 2L, 1000L)))
    assert(out((0L, 1L)) == ((1L, 2L, 500L)))
    assert(out((2L, 0L)) == ((1L, 1L, 1000L)))
    assert(out.size == 3)
  }
}
