package graft.ops

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("applyCdcToAgg equals a from-scratch recompute on the " +
      "effective row set") {
    val base = Seq(("a", 3L, 30L), ("b", 2L, 20L), ("c", 1L, 5L))
      .toDF("k", "n", "s")
    // delta: insert (a,+7), delete one b row worth 12, insert new key d,
    // delete c's only row (group must vanish)
    val delta = Seq(
      ("a", 1L, 7L), ("b", -1L, 12L), ("d", 1L, 100L), ("c", -1L, 5L),
    ).toDF("k", "sgn", "v")
    val out = Incremental.applyCdcToAgg(base, delta, "k", "sgn", "v")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out == Map(
      "a" -> ((4L, 37L)), "b" -> ((1L, 8L)), "d" -> ((1L, 100L))))
  }

  test("applyCdcToAgg drops a group whose count reaches zero even with " +
      "a nonzero residual sum, and surfaces negative counts unclamped") {
    val base = Seq(("gone", 2L, 10L), ("over", 1L, 5L)).toDF("k", "n", "s")
    val delta = Seq(
      // 'gone': two deletes whose values DON'T sum to 10 (corrupt CDC) —
      // count rule still drops it (count' = 0)
      ("gone", -1L, 4L), ("gone", -1L, 4L),
      // 'over': delete 2 rows from a count-1 group → negative count
      ("over", -1L, 3L), ("over", -1L, 3L),
    ).toDF("k", "sgn", "v")
    val out = Incremental.applyCdcToAgg(base, delta, "k", "sgn", "v")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(!out.contains("gone"))
    assert(out("over") == ((-1L, -1L))) // surfaced, not clamped
  }

  test("applyCdcToAgg is one |delta|-sized shuffle + join: no rescan of " +
      "base, delta pre-aggregated before the join") {
    val base = Seq(("a", 1L, 1L)).toDF("k", "n", "s")
    val delta = Seq(("a", 1L, 2L)).toDF("k", "sgn", "v")
    val plan = Incremental.applyCdcToAgg(base, delta, "k", "sgn", "v")
      .queryExecution.optimizedPlan.toString
    // delta aggregates BELOW the join (per-key fold happens pre-shuffle
    // with partial aggregation; the join sees one row per delta key)
    val joinIdx = plan.indexOf("Join")
    val aggIdx = plan.lastIndexOf("Aggregate")
    assert(joinIdx >= 0 && aggIdx > joinIdx, plan)
  }
}
