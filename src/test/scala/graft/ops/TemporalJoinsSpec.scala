package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin attaches the latest right row at or before each left ts") {
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), 100.0),
      (1L, ts("2026-01-01 12:00:00"), 200.0),
      (2L, ts("2026-01-01 11:00:00"), 999.0),
    ).toDF("user_id", "ts", "value")
    val left = Seq(
      (10L, 1L, ts("2026-01-01 09:00:00")), // before any snapshot → null
      (11L, 1L, ts("2026-01-01 10:00:00")), // equal ts → inclusive match
      (12L, 1L, ts("2026-01-01 11:30:00")), // between → 10:00 snapshot
      (13L, 1L, ts("2026-01-01 13:00:00")), // after both → 12:00 snapshot
      (14L, 3L, ts("2026-01-01 13:00:00")), // key with no right rows
    ).toDF("event_id", "user_id", "ts")
    val out = TemporalJoins
      .asOfJoin(left, right, "user_id", "ts", Seq("value"))
      .select($"event_id", $"asof_ts", $"asof_value")
      .as[(Long, Option[Timestamp], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(10L) == ((None, None)))
    assert(out(11L) == ((Some(ts("2026-01-01 10:00:00")), Some(100.0))))
    assert(out(12L) == ((Some(ts("2026-01-01 10:00:00")), Some(100.0))))
    assert(out(13L) == ((Some(ts("2026-01-01 12:00:00")), Some(200.0))))
    assert(out(14L) == ((None, None)))
    assert(out.size == 5) // every left row survives exactly once
  }

  test("asOfJoin never leaks a future right row (label-leakage guard)") {
    val right = Seq((1L, ts("2026-01-02 00:00:00"), 7.0))
      .toDF("user_id", "ts", "value")
    val left = Seq((1L, 1L, ts("2026-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = TemporalJoins
      .asOfJoin(left, right, "user_id", "ts", Seq("value"))
      .select($"asof_value").as[Option[Double]].collect()
    assert(out.toSeq == Seq(None))
  }

  test("asOfJoin plan: one exchange, one sort — no nested loop") {
    val right = Seq((1L, ts("2026-01-01 00:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    val left = Seq((1L, 1L, ts("2026-01-01 01:00:00")))
      .toDF("event_id", "user_id", "ts")
    val plan = TemporalJoins
      .asOfJoin(left, right, "user_id", "ts", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
    // both sides shuffle into ONE hashpartitioning(user_id) exchange
    // each; the payload windows collapse into a single Window operator
    assert(plan.split("\n").count(_.contains("Window")) == 1)
  }

  test("asOfJoin refuses colliding payload names") {
    val df = Seq((1L, ts("2026-01-01 00:00:00"), 1.0))
      .toDF("user_id", "ts", "asof_value")
    intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoin(df, df.withColumnRenamed("asof_value", "value"),
        "user_id", "ts", Seq("value"))
    }
  }

  test("asOfJoin attaches the matched row WHOLESALE: its null payload " +
      "field stays null instead of resurrecting an older row's value") {
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), Some(100.0), Some("a")),
      // the matched row carries a NULL value — per-column fills would
      // skip it and attach 100.0 from 10:00 while taking label "b" from
      // 11:00 (columns from two different right rows)
      (1L, ts("2026-01-01 11:00:00"), None, Some("b")),
    ).toDF("user_id", "ts", "value", "label")
    val left = Seq((20L, 1L, ts("2026-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = TemporalJoins
      .asOfJoin(left, right, "user_id", "ts", Seq("value", "label"))
      .select($"asof_ts", $"asof_value", $"asof_label")
      .as[(Option[Timestamp], Option[Double], Option[String])].collect()
    assert(out.toSeq ==
      Seq((Some(ts("2026-01-01 11:00:00")), None, Some("b"))))
  }

  test("asOfJoin tie-breaks duplicate (key, ts) right rows " +
      "deterministically: max payload struct wins") {
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1.0),
      (1L, ts("2026-01-01 10:00:00"), 9.0),
      (1L, ts("2026-01-01 10:00:00"), 5.0),
    ).toDF("user_id", "ts", "value")
    val left = Seq((30L, 1L, ts("2026-01-01 10:30:00")))
      .toDF("event_id", "user_id", "ts")
    // payload struct is (ts, value); equal ts → max value wins
    val out = TemporalJoins
      .asOfJoin(left, right, "user_id", "ts", Seq("value"))
      .select($"asof_value").as[Option[Double]].collect()
    assert(out.toSeq == Seq(Some(9.0)))
  }

  test("asOfJoin refuses a reserved internal column on either side") {
    val right = Seq((1L, ts("2026-01-01 00:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoin(
        Seq((1L, 1L, ts("2026-01-01 01:00:00"), "x"))
          .toDF("event_id", "user_id", "ts", "__payload"),
        right, "user_id", "ts", Seq("value"))
    }
    intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoin(
        Seq((1L, 1L, ts("2026-01-01 01:00:00"))).toDF("event_id", "user_id", "ts"),
        right.withColumn("__src", $"value"), "user_id", "ts", Seq("value"))
    }
  }

  test("rangeJoin finds exactly the contained points, ends inclusive") {
    val points = Seq(
      (1L, ts("2026-01-01 10:00:00")),
      (2L, ts("2026-01-01 10:05:00")), // == interval end → inclusive
      (3L, ts("2026-01-01 10:05:01")), // just outside
      (4L, ts("2026-01-01 23:00:00")),
    ).toDF("event_id", "pt")
    val intervals = Seq(
      (100L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:05:00")),
      // spans many 5-min bins — must still match each point ONCE
      (200L, ts("2026-01-01 09:00:00"), ts("2026-01-01 11:00:00")),
    ).toDF("window_id", "start_ts", "end_ts")
    val out = TemporalJoins
      .rangeJoin(points, intervals, "pt", "start_ts", "end_ts", 300L)
      .select($"event_id", $"window_id").as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 100L), (1L, 200L), (2L, 100L), (2L, 200L),
      (3L, 200L)))
  }

  test("rangeJoin plan: equality shuffle join on the bin, no nested loop") {
    val points = Seq((1L, ts("2026-01-01 10:00:00"))).toDF("event_id", "pt")
    val intervals = Seq((9L, ts("2026-01-01 09:00:00"),
      ts("2026-01-01 11:00:00"))).toDF("window_id", "start_ts", "end_ts")
    val plan = TemporalJoins
      .rangeJoin(points, intervals, "pt", "start_ts", "end_ts", 300L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
  }

  test("rangeJoin refuses colliding column names") {
    val points = Seq((1L, ts("2026-01-01 10:00:00"))).toDF("id", "pt")
    val intervals = Seq((9L, ts("2026-01-01 09:00:00"),
      ts("2026-01-01 11:00:00"))).toDF("id", "start_ts", "end_ts")
    intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoin(points, intervals, "pt", "start_ts", "end_ts")
    }
  }

  test("rangeJoin refuses a pre-existing __bin column") {
    val points = Seq((1L, ts("2026-01-01 10:00:00"), 0L))
      .toDF("event_id", "pt", "__bin")
    val intervals = Seq((9L, ts("2026-01-01 09:00:00"),
      ts("2026-01-01 11:00:00"))).toDF("window_id", "start_ts", "end_ts")
    intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoin(points, intervals, "pt", "start_ts", "end_ts")
    }
  }

  test("rangeJoin fails loudly on an open-ended interval instead of " +
      "exploding it to millions of rows") {
    val points = Seq((1L, ts("2026-01-01 10:00:00"))).toDF("event_id", "pt")
    val intervals = Seq(
      // the unclosed-outage sentinel: end date far in the future
      (9L, ts("2026-01-01 09:00:00"), ts("9999-12-31 00:00:00")))
      .toDF("window_id", "start_ts", "end_ts")
    val e = intercept[Exception] {
      TemporalJoins.rangeJoin(points, intervals, "pt", "start_ts", "end_ts",
        binSeconds = 300L, maxBinsPerInterval = 1000L).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("maxBinsPerInterval")))
  }

  test("rangeJoin drops a NULL-bounded interval instead of crashing the " +
      "guard branch") {
    val points = Seq((1L, ts("2026-01-01 10:00:00"))).toDF("event_id", "pt")
    val intervals = Seq(
      (9L, Some(ts("2026-01-01 09:00:00")), Option.empty[java.sql.Timestamp]),
      (10L, Option.empty[java.sql.Timestamp], Some(ts("2026-01-01 11:00:00"))),
      (11L, Some(ts("2026-01-01 09:00:00")), Some(ts("2026-01-01 11:00:00"))))
      .toDF("window_id", "start_ts", "end_ts")
    val out = TemporalJoins
      .rangeJoin(points, intervals, "pt", "start_ts", "end_ts", 300L)
      .select($"event_id", $"window_id").as[(Long, Long)].collect().sorted
    // NULL-bounded intervals 9 and 10 are dropped; the closed one matches
    assert(out.toSeq == Seq((1L, 11L)))
  }

  test("mergeIntervals: overlap and touch merge, gaps split, nulls drop, " +
      "duplicates count") {
    val iv = Seq(
      // user 1: [0,10] + [5,20] overlap; [20,30] touches → one island;
      //         [40,50] after a gap → second island
      (1L, Some(0L), Some(10L)),
      (1L, Some(5L), Some(20L)),
      (1L, Some(20L), Some(30L)),
      (1L, Some(40L), Some(50L)),
      // user 2: identical duplicate intervals merge into one island of 2
      (2L, Some(100L), Some(110L)),
      (2L, Some(100L), Some(110L)),
      // user 3: null-bounded rows drop entirely
      (3L, Some(1L), Option.empty[Long]),
      (3L, Option.empty[Long], Some(2L)),
      // user 4: a contained interval [12,14] inside [10,20] must NOT
      // split the island even though its end regresses
      (4L, Some(10L), Some(20L)),
      (4L, Some(12L), Some(14L)),
      (4L, Some(19L), Some(25L)),
    ).toDF("user_id", "s", "e")
    val out = TemporalJoins.mergeIntervals(iv, "user_id", "s", "e")
      .select($"user_id", $"island_seq", $"island_start", $"island_end",
        $"n_merged")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 0L, 30L, 3L),
      (1L, 2L, 40L, 50L, 1L),
      (2L, 1L, 100L, 110L, 2L),
      (4L, 1L, 10L, 25L, 3L)))
  }

  test("fillHourlyGaps: zero rows exist for silent hours, observed " +
      "hours aggregate, span guard fires loudly") {
    // user 1: events in hours 100 and 103 → grid 100..103 with two
    // zero-filled hours; user 2: single hour
    def at(h: Long, plus: Long) = new Timestamp((h * 3600 + plus) * 1000)
    val ev = Seq(
      (1L, at(100, 5), 10L), (1L, at(100, 9), 7L), (1L, at(103, 1), 3L),
      (2L, at(500, 0), 1L),
    ).toDF("user_id", "ts", "cents")
    val out = TemporalJoins.fillHourlyGaps(ev, "user_id", "ts", "cents")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 100L, 2L, 17L), (1L, 101L, 0L, 0L), (1L, 102L, 0L, 0L),
      (1L, 103L, 1L, 3L), (2L, 500L, 1L, 1L)))
    val e = intercept[Exception] {
      TemporalJoins.fillHourlyGaps(ev, "user_id", "ts", "cents",
        maxHoursPerKey = 3L).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("fillHourlyGaps")))
  }

  test("interpolateLinear: rising and falling segments integer-exact, " +
      "observed rows untouched") {
    // key 1 grid: hours 0..4; observed 0→(1 ev, 100) and 4→(2 ev, 20):
    // falling segment, span 4, delta -80 → hour1: 100 + (-80*1) div 4
    // = 80 (exact); hour2: 60; hour3: 40. Both engines' truncation
    // agrees through the sign guard.
    val grid = Seq(
      (1L, 0L, 1L, 100L), (1L, 1L, 0L, 0L), (1L, 2L, 0L, 0L),
      (1L, 3L, 0L, 0L), (1L, 4L, 2L, 20L),
      // key 2: non-divisible rising segment 0→(10), 3→(11): delta 1
      // over span 3 → hours 1, 2 interp to 10 (truncated)
      (2L, 0L, 1L, 10L), (2L, 1L, 0L, 0L), (2L, 2L, 0L, 0L),
      (2L, 3L, 1L, 11L),
    ).toDF("user_id", "hour", "n_events", "sum_val")
    val out = TemporalJoins.interpolateLinear(grid, "user_id", "hour",
        "sum_val", "n_events")
      .select($"user_id", $"hour", $"interp_val")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map(
      (1L, 0L) -> 100L, (1L, 1L) -> 80L, (1L, 2L) -> 60L,
      (1L, 3L) -> 40L, (1L, 4L) -> 20L,
      (2L, 0L) -> 10L, (2L, 1L) -> 10L, (2L, 2L) -> 10L,
      (2L, 3L) -> 11L))
  }

  test("mergeIntervals plan: per-group windows only — no SinglePartition " +
      "funnel") {
    val iv = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"ts".cast("long").as("s"),
        ($"ts".cast("long") + 600L).as("e"))
    val plan = TemporalJoins.mergeIntervals(iv, "user_id", "s", "e")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("businessDayCumSql matches a brute-force weekday count over " +
      "5000 random in-domain epoch days") {
    // brute(d) = weekday count in epoch days (0, d] — so for any a, b:
    // brute(b) - brute(a) = weekdays in (a, b], the same difference
    // contract the closed form encodes; compare through h(0). Domain
    // is d >= -4 (see scaladoc: Spark div truncation below that).
    def isWeekday(d: Long): Boolean = {
      // epoch day 0 = Thursday 1970-01-01
      val dow = (((d % 7) + 7) % 7).toInt // 0=Thu .. 6=Wed
      dow != 2 && dow != 3 // 2=Sat, 3=Sun
    }
    def brute(d: Long): Long =
      if (d > 0) (1L to d).count(isWeekday).toLong
      else -((d + 1) to 0L).count(isWeekday).toLong
    val rnd = new scala.util.Random(42)
    val days = Seq.tabulate(5000)(_ => rnd.between(-4L, 40000L)) :+ 0L
    val computed = days.toDF("d")
      .selectExpr("d", s"${TemporalJoins.businessDayCumSql("d")} AS h")
      .as[(Long, Long)].collect()
    val base = computed.collectFirst { case (0L, h) => h }.get
    computed.foreach { case (d, h) =>
      assert(h - base == brute(d),
        s"d=$d closed=${h - base} brute=${brute(d)}")
    }
  }

  test("businessDayCumSql span check: Mon→Fri same week = 4, over a " +
      "weekend = 1, full week = 5") {
    def h(d: Long): Long = Seq(d).toDF("d")
      .selectExpr(s"${TemporalJoins.businessDayCumSql("d")} AS h")
      .as[Long].head()
    // epoch day 4 = Monday 1970-01-05; 8 = Friday 1970-01-09
    assert(h(8) - h(4) == 4) // Mon→Fri exclusive-start
    assert(h(11) - h(8) == 1) // Fri→Mon crosses weekend: only Mon
    assert(h(15) - h(8) == 5) // Fri→next Fri: full business week
    assert(h(10) - h(8) == 0) // Fri→Sun: zero business days
  }
}
