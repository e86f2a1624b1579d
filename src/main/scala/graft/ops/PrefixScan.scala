package graft.ops

import scala.reflect.ClassTag

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** The house two-pass DISTRIBUTED PREFIX SCAN — one primitive for
  * every "ordered running state over an unbounded axis" operator that
  * a naive plan would funnel through a single-partition window.
  * Extracted (r9 brief) from four hand-rolled copies of the same
  * shape: [[Packing.globalRowNumber]] (running count → global rank),
  * [[SeriesStats.cusumIntScan]] (prefix sums + running extrema),
  * [[RankStats.ksTestScaled]] (cumulative pair counts), and the rank
  * machinery under [[RankStats.avgRankX2]]; new scans
  * ([[SeriesStats.sprtBernoulliScan]]) state only their monoid.
  *
  * Shape (Blelloch 1990's scan decomposition, adapted to Spark's
  * range-shuffle): range-partition by the total order and sort within
  * partitions, then
  *   pass 1 — fold each partition to ONE summary state (map-side,
  *     nothing shuffles);
  *   driver  — combine the P summaries IN PARTITION ORDER into each
  *     partition's incoming state (P monoid values — metadata, not
  *     data);
  *   pass 2 — stream each partition once, carrying local state from
  *     the broadcast incoming value and emitting per-row outputs.
  * Wall cost is two scans of the sorted axis; memory is O(state) per
  * task — no collected arrays, no single-task sort, so the scan
  * survives an axis that is itself 100 TB.
  *
  * Correctness contract: `combine` must be ASSOCIATIVE with identity
  * `zero`, and fold-equivalent to `step` (folding a partition's rows
  * then combining must equal stepping through both partitions) — the
  * standard parallel-scan monoid laws. The order columns must be a
  * TOTAL order over rows whose emitted values depend on position
  * (ties across a range boundary land nondeterministically
  * otherwise — the [[Packing.globalRowNumber]] tie rule).
  */
object PrefixScan {

  /** Per-partition scan monoid: the state S, its transitions, and the
    * per-row output. Implementations are tiny value holders — see
    * [[Packing.globalRowNumber]]'s running count or
    * [[SeriesStats.cusumIntScan]]'s four-scalar prefix/extremum state.
    */
  trait ScanMonoid[S] extends Serializable {

    /** Columns `step` reads, in the order its value array presents
      * them. Pass 1 projects the sorted axis down to EXACTLY these
      * (empty = pass 1 folds zero-column rows, e.g. a pure counter —
      * the cheapest possible summary pass). */
    def stepCols: Seq[String]

    /** Extra columns `emit` reads beyond [[stepCols]] (pass 2 only). */
    def emitCols: Seq[String] = Nil

    /** Identity state: the scan's value before any row. */
    def zero: S

    /** Advance the state by one row. `v` holds the row's [[stepCols]]
      * values positionally. */
    def step(s: S, v: Array[Any]): S

    /** Merge two adjacent partition summaries (left THEN right). Must
      * be associative with identity [[zero]] and agree with [[step]]
      * composition. */
    def combine(a: S, b: S): S

    /** Per-row output values, appended to the row. Called with the
      * POST-step state and the row's [[stepCols]] ++ [[emitCols]]
      * values. */
    def emit(post: S, v: Array[Any]): Seq[Any]

    /** Early-exit guard: once true for a row's PRE-step state, that
      * row and everything after it is skipped — partitions whose
      * incoming state is already done are skipped WHOLESALE (a top-K
      * truncation never deserializes the tail). Must be MONOTONE
      * (never true→false under step/combine). Default: never. */
    def done(s: S): Boolean = false
  }

  /** Run the scan: `df` ordered by `order`, per-row outputs appended
    * as `outFields`. Input is materialized before the range shuffle
    * (the sampler's job and the shuffle would otherwise each
    * re-execute the upstream plan) and again after the sort so both
    * passes observe the SAME partitioning (the
    * [[Packing.chunkAssignments]] rule). */
  def scan[S: ClassTag](df: DataFrame, order: Seq[Column],
      outFields: Seq[StructField], m: ScanMonoid[S],
      numPartitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "need at least one ordering column")
    val spark = df.sparkSession
    import Materialize.MaterializeOps
    val pre = df.materialized
    val p = if (numPartitions > 0) numPartitions
      else {
        // scale-adaptive range width (r14, guide §2): a constant
        // conf-wide shuffle put 32 near-empty sorted partitions (and a
        // RangePartitioner SAMPLING JOB) under every tiny rank/quantile
        // frame — the scan family's dominant fixed cost at small sf.
        // The materialized input's OWN width is free to read (the
        // localCheckpoint already executed, so `.rdd` is the stored
        // blocks, no re-execution) and already scale-sized: AQE byte-
        // coalescing for post-shuffle frames, input splits for scans —
        // tiny frames range-shuffle to ONE partition (p=1 skips the
        // sampling pass outright), 100 TB frames keep the conf width.
        val conf = spark.sessionState.conf.numShufflePartitions
        math.min(conf, math.max(1, pre.rdd.getNumPartitions))
      }
    val base = pre
      .repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .materialized
    // pass 1: one summary state per partition, over ONLY the columns
    // the transition reads (a zero-column projection for counters)
    val stepN = m.stepCols.size
    val partials: Array[(Int, S)] =
      base.select(m.stepCols.map(col): _*).rdd
        .mapPartitionsWithIndex { (pid, it) =>
          var s = m.zero
          it.foreach { r =>
            val v = new Array[Any](stepN)
            var i = 0
            while (i < stepN) { v(i) = r.get(i); i += 1 }
            s = m.step(s, v)
          }
          Iterator.single(pid -> s)
        }.collect()
    // driver fold: incoming state per partition in pid order —
    // P monoid values, metadata not data
    val incoming = new Array[S](p)
    locally {
      val byPid = partials.toMap
      var acc = m.zero
      for (i <- 0 until p) {
        incoming(i) = acc
        byPid.get(i).foreach(s => acc = m.combine(acc, s))
      }
    }
    val bcIncoming = spark.sparkContext.broadcast(incoming)
    val stepPos = m.stepCols.map(base.schema.fieldIndex).toArray
    val emitPos =
      (m.stepCols ++ m.emitCols).map(base.schema.fieldIndex).toArray
    val outSchema = StructType(base.schema.fields ++ outFields)
    // pass 2: one streamed pass per partition, O(state) memory
    spark.createDataFrame(
      base.rdd.mapPartitionsWithIndex { (pid, it) =>
        var s = bcIncoming.value(pid)
        if (m.done(s)) Iterator.empty
        else it.takeWhile(_ => !m.done(s)).map { r =>
          val sv = new Array[Any](stepPos.length)
          var i = 0
          while (i < stepPos.length) { sv(i) = r.get(stepPos(i)); i += 1 }
          s = m.step(s, sv)
          val ev = new Array[Any](emitPos.length)
          i = 0
          while (i < emitPos.length) { ev(i) = r.get(emitPos(i)); i += 1 }
          Row.fromSeq(r.toSeq ++ m.emit(s, ev))
        }
      }, outSchema)
  }
}
