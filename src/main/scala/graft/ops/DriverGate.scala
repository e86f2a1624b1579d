package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.LongType

/** The ONE driver-local short-circuit gate shared by the iterative
  * graph operators (r13 verdict "next" #6): [[Dedup.duplicateClusters]],
  * [[Dedup.duplicateClustersStar]], and [[GraphOps.kCorePeel]] each
  * size-gate a collect of their edge frame before replacing a
  * job-launch-bound distributed loop (~0.7 s of fixed cost per round at
  * tiny sizes — see [[Dedup.DriverUnionFindCap]]'s rationale) with an
  * exact in-memory algorithm. The cap/byte math and the type guard
  * lived in three copies; this is the single implementation so they can
  * never drift.
  *
  * Contract pieces, shared verbatim by all three call sites:
  *  - **Type guard**: only BIGINT id columns engage the gate — the
  *    rebuilt driver-side frame is typed long, and any other id type
  *    must keep the distributed path so the output schema never shifts
  *    with data size.
  *  - **Size guard**: row count ≤ `cap` (default [[EdgeCap]] = 2 M
  *    edges — two longs each ≈ 32 MB collected, the same driver-size
  *    budget as the IVF training sample and the MMR id gate). Callers
  *    pass cap = -1 to FORCE the distributed path (the forced-
  *    distributed equality properties in CorpusOpsSpec/GraphOpsSpec).
  *  - **No wasted jobs**: when the type guard already excludes the
  *    gate, no count job runs; when a count ran, it is returned so an
  *    iterative caller (duplicateClustersStar carries the edge count
  *    into its convergence check) never re-counts the same frame.
  */
object DriverGate {

  /** 2 M (long, long) edges ≈ 32 MB on the driver — far under any sane
    * driver heap, while per-round fixed job cost dominates distributed
    * iterative loops at these sizes. */
  val EdgeCap = 2000000L

  /** The gate probe's outcome: `count` is Some when a count job ran
    * (type guard passed), `edges` is Some when the gate ENGAGED (count
    * within cap) — the collected (a, b) pairs, row order preserved. */
  final case class Probe(count: Option[Long],
      edges: Option[Array[(Long, Long)]])

  /** Probe `df` for driver-local eligibility on columns (`a`, `b`).
    * The frame should already be materialized/persisted by the caller
    * (every call site collects a frame it also feeds the distributed
    * fallback), so the count and collect re-read computed blocks. */
  def edges(df: DataFrame, a: String, b: String,
      cap: Long = EdgeCap): Probe = {
    val bothLong = df.schema(a).dataType == LongType &&
      df.schema(b).dataType == LongType
    if (!bothLong) Probe(None, None)
    else {
      val n = df.count()
      if (n <= cap) {
        val spark = df.sparkSession
        import spark.implicits._
        Probe(Some(n),
          Some(df.select(df.col(a), df.col(b)).as[(Long, Long)].collect()))
      } else Probe(Some(n), None)
    }
  }
}
