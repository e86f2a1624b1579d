package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for.
  *
  * As-of (point-in-time) join: for every left row, attach the most
  * recent right row with the same key and `right.ts <= left.ts` — the
  * feature-store/backtest join (a training example must see the
  * feature value AS OF its own timestamp, never a later one — the
  * classic label-leakage bug).
  *
  * Why not a non-equi join: "latest r with r.ts <= l.ts" as a join
  * predicate explodes to every (l, earlier-r) candidate pair per key
  * and still needs a max-per-l post-aggregation; Catalyst plans the
  * theta form as a nested-loop. The union-scan form here is the
  * standard one-shuffle shape: tag both sides, union, sort each key
  * group by (ts, side), and a running last-non-null carries right
  * payloads forward into the left rows that follow. Cost at 100 TB:
  * ONE hash shuffle of L+R on the key plus a per-key sort — the same
  * price as the equi-join the naive form would need anyway, with no
  * pair blowup; per-row window state is O(payload), so a hot key is a
  * sequential scan, not a memory hazard. (Streaming twin:
  * `mapGroupsWithState` holding the same running payload.)
  *
  * Tie semantics match DuckDB's `ASOF JOIN … ON l.ts >= r.ts` (q71's
  * oracle): an equal-timestamp right row IS visible to the left row
  * (right sorts before left at the same ts). Right rows should be
  * unique per (key, ts) — with duplicates, which one wins is
  * tie-broken by the payload ordering, documented rather than chosen.
  */
object TemporalJoins {

  /** @param payloadCols right columns carried onto left rows, emitted
    *                    as `prefix+col`; the matched right timestamp is
    *                    emitted as `prefix+tsCol` (null when no right
    *                    row precedes the left row). */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    require(!left.columns.contains("__src"),
      "left must not already carry a __src column")
    val outPayload = (tsCol +: payloadCols).map(prefix + _)
    require(outPayload.intersect(left.columns.toSeq).isEmpty,
      s"prefixed payload ${outPayload.mkString(",")} collides with left")
    // unified schema: every left column + prefixed right payloads; the
    // side each column is absent from carries typed nulls
    val lSide = (tsCol +: payloadCols).map(c => c -> right.schema(c).dataType)
      .foldLeft(left.withColumn("__src", lit(1))) { case (df, (c, t)) =>
        df.withColumn(prefix + c, lit(null).cast(t))
      }
    val rTagged = right.select(
      col(keyCol) +: col(tsCol) +:
        (tsCol +: payloadCols).map(c => col(c).as(prefix + c)): _*)
      .withColumn("__src", lit(0))
    val rSide = left.columns.filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(rTagged) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same window spec for every payload → Catalyst collapses them into
    // one Window operator / one sort
    val filled = outPayload.foldLeft(lSide.unionByName(rSide)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__src") === 1).drop("__src")
  }

  /** Range (interval) join WITHOUT an equi-key: every (point, interval)
    * pair with `start <= point <= end` — attribution windows, outage
    * overlays, sensor alignment. Catalyst plans the bare BETWEEN
    * predicate as BroadcastNestedLoopJoin (|P|·|I| comparisons); this is
    * the standard BINNED decomposition: time is cut into `binSeconds`
    * buckets, each interval explodes to the buckets it covers, each
    * point lands in exactly ONE bucket, and the join becomes a plain
    * equality shuffle on the bucket id with the exact BETWEEN as a
    * post-filter. A point's bucket is unique, so no dedup pass is
    * needed. Binning is candidate generation only — any monotonic bin
    * function preserves coverage, the BETWEEN filter is authoritative.
    *
    * Cost at scale: shuffle = |points| + Σ(interval span / binSeconds)
    * rows; per-bin work is quadratic in bin occupancy. Pick binSeconds
    * near the median interval length (big bins → fat buckets; small
    * bins → interval replication). A globally hot time range is a
    * skewed bucket — AQE skew-join splits it; an equi-key (user,
    * region) should ride IN FRONT of the bucket when the data has one
    * (compose: add the key to both sides' join columns).
    *
    * Both frames keep all their columns; prefix/rename before calling
    * if names collide (checked).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, ptCol: String,
      startCol: String, endCol: String, binSeconds: Long = 300L): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val overlap = points.columns.toSeq.intersect(intervals.columns.toSeq)
    require(overlap.isEmpty,
      s"column names collide across sides: ${overlap.mkString(",")}")
    val binMicros = binSeconds * 1000000L
    def binOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c) / lit(binMicros)).cast("long")
    val p = points.withColumn("__bin", binOf(col(ptCol)))
    val i = intervals.withColumn("__bin",
      explode(sequence(binOf(col(startCol)), binOf(col(endCol)))))
    p.join(i, Seq("__bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }
}
