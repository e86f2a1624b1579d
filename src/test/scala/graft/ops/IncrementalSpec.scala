package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.sum

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

  test("joinDelta equals new-join minus old-join, including the " +
      "ΔA⋈ΔB cross term and delete×insert cancellation") {
    val aOld = Seq((1L, "a1")).toDF("k", "a")
    val dA = Seq((1L, "a1", -1L), (5L, "a5", 1L)).toDF("k", "a", "sgn")
    val bOld = Seq((1L, "b1")).toDF("k", "b")
    val dB = Seq((1L, "b6", 1L), (5L, "b7", 1L)).toDF("k", "b", "sgn")
    // effective A = {(5,a5)}, effective B = {(1,b1),(1,b6),(5,b7)}
    // new join = {(5,a5,b7)}; old join = {(1,a1,b1)}
    // net signed delta: −(1,a1,b1); (1,a1,b6) cancels (t2 +1, t3 −1);
    // +(5,a5,b7) arises ONLY from the ΔA⋈ΔB cross term
    val out = Incremental.joinDelta(aOld, dA, bOld, dB, "k", "sgn")
      .groupBy($"k", $"a", $"b")
      .agg(sum($"sgn").as("net")).filter($"net" =!= 0L)
      .as[(Long, String, String, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(out == Map(
      (1L, "a1", "b1") -> -1L, (5L, "a5", "b7") -> 1L))
  }

  test("joinDelta sign products: two deletes joining give +1") {
    val aOld = Seq.empty[(Long, String)].toDF("k", "a")
    val bOld = Seq.empty[(Long, String)].toDF("k", "b")
    val dA = Seq((1L, "a1", -1L)).toDF("k", "a", "sgn")
    val dB = Seq((1L, "b1", -1L)).toDF("k", "b", "sgn")
    val out = Incremental.joinDelta(aOld, dA, bOld, dB, "k", "sgn")
      .select($"k", $"sgn").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L)))
  }

  test("joinDelta refuses colliding payloads and malformed deltas") {
    val a = Seq((1L, "x")).toDF("k", "p")
    val b = Seq((1L, "y")).toDF("k", "p") // collides with a's payload
    val da = Seq((1L, "x", 1L)).toDF("k", "p", "sgn")
    intercept[IllegalArgumentException] {
      Incremental.joinDelta(a, da, b, da, "k", "sgn")
    }
    val b2 = Seq((1L, "y")).toDF("k", "q")
    val badDb = Seq((1L, 1L)).toDF("k", "sgn") // missing payload q
    intercept[IllegalArgumentException] {
      Incremental.joinDelta(a, da, b2, badDb, "k", "sgn")
    }
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
