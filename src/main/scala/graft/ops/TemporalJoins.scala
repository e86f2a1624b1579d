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
  * [[graft.streaming.StreamOps.asOfJoinStream]] — `mapGroupsWithState`
  * holding the same running payload, q93-oracled against the same
  * DuckDB ASOF JOIN.)
  *
  * Tie semantics match DuckDB's `ASOF JOIN … ON l.ts >= r.ts` (q71's
  * oracle): an equal-timestamp right row IS visible to the left row
  * (right sorts before left at the same ts). Duplicate right rows per
  * (key, ts) are tie-broken deterministically: the MAXIMUM payload
  * struct (field-by-field comparison over (ts, payloadCols)) wins —
  * chosen and tested, not left to partition order. Payloads containing
  * a non-orderable type (map) fall back to the un-tie-broken ordering,
  * called out in the returned plan's nondeterminism.
  */
object TemporalJoins {

  /** @param payloadCols right columns carried onto left rows, emitted
    *                    as `prefix+col`; the matched right timestamp is
    *                    emitted as `prefix+tsCol` (null when no right
    *                    row precedes the left row). The matched row's
    *                    values are attached WHOLESALE — a null in a
    *                    payload column stays null (per-column fills
    *                    would resurrect an older row's value and mix
    *                    columns from different right rows). */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    require(!left.columns.contains("__src") && !right.columns.contains("__src"),
      "inputs must not already carry a __src column")
    require(!left.columns.contains("__payload") &&
      !right.columns.contains("__payload"),
      "inputs must not already carry a __payload column")
    val payloadFields = tsCol +: payloadCols
    val outPayload = payloadFields.map(prefix + _)
    require(outPayload.intersect(left.columns.toSeq).isEmpty,
      s"prefixed payload ${outPayload.mkString(",")} collides with left")
    // ONE struct column carries the whole right payload: it is non-null
    // for every right row even when individual payload fields are null,
    // so a single last(ignoreNulls) attaches the matched row's values
    // nulls included — N independent per-column fills would skip a null
    // field and resurrect an OLDER right row's value, silently mixing
    // columns from different right rows (the classic as-of bug).
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadFields.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    val lSide = left.withColumn("__src", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
    val rSide0 = right.select(col(keyCol), col(tsCol),
      struct(payloadFields.map(col): _*).as("__payload"))
      .withColumn("__src", lit(0))
    val rSide = left.columns.filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(rSide0) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    // deterministic duplicate-(key, ts) tie-break: order right rows by
    // the payload struct too (struct ordering is field-by-field), so the
    // MAX payload is the one last() carries; non-orderable payload types
    // (maps) keep the unordered form
    val payloadOrderable = org.apache.spark.sql.catalyst.expressions
      .RowOrdering.isOrderable(rSide.schema("__payload").dataType)
    val ordering =
      if (payloadOrderable)
        Seq(col(tsCol).asc, col("__src").asc, col("__payload").asc_nulls_last)
      else Seq(col(tsCol).asc, col("__src").asc)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lSide.unionByName(rSide)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
    val unpacked = payloadFields.foldLeft(filled) { (df, c) =>
      df.withColumn(prefix + c, col("__payload").getField(c))
    }
    unpacked.filter(col("__src") === 1).drop("__src", "__payload")
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
  /** @param maxBinsPerInterval runaway guard: an open-ended interval (a
    *                            sentinel end date, an unclosed outage)
    *                            would otherwise explode to millions of
    *                            rows silently — any interval covering
    *                            more bins fails the job loudly. At the
    *                            default 300 s bins the default cap is
    *                            ~9.5 years; clamp or pre-filter the
    *                            intervals (or raise binSeconds) instead
    *                            of raising the cap. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, ptCol: String,
      startCol: String, endCol: String, binSeconds: Long = 300L,
      maxBinsPerInterval: Long = 1000000L): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    val overlap = points.columns.toSeq.intersect(intervals.columns.toSeq)
    require(overlap.isEmpty,
      s"column names collide across sides: ${overlap.mkString(",")}")
    // __bin is internal; a pre-existing one on either side would be
    // silently overwritten and dropped (mirrors asOfJoin's __src guard)
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "inputs must not already carry a __bin column")
    val binMicros = binSeconds * 1000000L
    def binOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c) / lit(binMicros)).cast("long")
    val p = points.withColumn("__bin", binOf(col(ptCol)))
    val nBins = binOf(col(endCol)) - binOf(col(startCol)) + 1
    // NULL-bounds branch must come FIRST: a null start/end makes the
    // nBins comparison null, which would otherwise fall through to the
    // raise_error branch (with a null message, since concat over the
    // null nBins is null). A null bound is the common encoding of an
    // unclosed interval; it is DROPPED here (explode over null emits no
    // rows), matching the pre-guard semantics — pre-filter the interval
    // side if an unclosed interval should be an error instead.
    val i = intervals.withColumn("__bin",
      explode(when(col(startCol).isNull || col(endCol).isNull,
          lit(null).cast("array<long>"))
        .when(nBins <= maxBinsPerInterval,
          sequence(binOf(col(startCol)), binOf(col(endCol))))
        .otherwise(raise_error(concat(
          lit("rangeJoin: interval covers "),
          coalesce(nBins.cast("string"), lit("?")),
          lit(s" bins > maxBinsPerInterval=$maxBinsPerInterval " +
            s"(binSeconds=$binSeconds); clamp the interval or raise " +
            "binSeconds"))))))
    p.join(i, Seq("__bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }

  /** MAX CONCURRENCY per group — the classic sweep-line reduction of
    * "how many intervals overlap at the peak" (active sessions,
    * simultaneous downloads, in-flight requests): explode every
    * interval into a +1 boundary at `start` and a −1 at `end`, running
    * sum in boundary order, take the max. Half-open [start, end)
    * semantics: at an equal timestamp the −1 sorts first (`__d` asc),
    * so an interval ending exactly when another starts never counts as
    * overlap. The running sum uses the default RANGE window frame —
    * peers at the same (t, d) aggregate together — so the result is
    * deterministic without a unique tiebreak.
    *
    * Scale shape: the window partitions by the group key (many groups
    * → cluster-wide parallelism; per-group boundary counts bounded by
    * the group's interval count). A GLOBAL sweep at corpus scale
    * should range-partition by time and stitch partition prefix sums —
    * the [[Packing.globalRowNumber]] two-pass shape — before windowing.
    *
    * @return (groupCol, max_concurrent long) — groups whose intervals
    *         are all null-bounded drop (no boundaries), matching the
    *         rangeJoin null-interval convention */
  def maxConcurrency(df: DataFrame, groupCol: String, startCol: String,
      endCol: String): DataFrame = {
    val b = df
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(col(groupCol), explode(array(
        struct(col(startCol).as("__t"), lit(1).as("__d")),
        struct(col(endCol).as("__t"), lit(-1).as("__d")))).as("__b"))
      .select(col(groupCol), col("__b.__t").as("__t"),
        col("__b.__d").as("__d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__t").asc, col("__d").asc)
    b.withColumn("__run", sum(col("__d")).over(w))
      .groupBy(col(groupCol))
      .agg(max(col("__run")).as("max_concurrent"))
  }

  /** Gaps-and-islands: merge each group's overlapping-or-touching
    * intervals into maximal covered islands. The classic two-window
    * shape — a running max of interval ends over the per-group
    * start-ordered history marks an island boundary wherever a start
    * exceeds every end seen before it; a running sum of those marks
    * numbers the islands; one group-by per (group, island) emits the
    * merged bounds. Cost: two windows + one aggregation, all
    * partitioned by the group key — per-key history is bounded
    * (sessions/leases per user), cluster-wide parallelism across keys,
    * never an unpartitioned frame. The sibling of [[maxConcurrency]]:
    * that one counts the overlap depth, this one erases it.
    *
    * Interval columns must be non-null longs (epoch seconds — the q35
    * floor convention keeps both engines on exact integers); rows with
    * a null bound are dropped like rangeJoin's null-interval rule.
    * Touching intervals (next.start == prev.end) merge: coverage is a
    * closed union, and the zero-length gap carries no uncovered time.
    *
    * @return one row per island: (groupCol, island_seq, island_start,
    *         island_end, n_merged) */
  def mergeIntervals(df: DataFrame, groupCol: String, startCol: String,
      endCol: String): DataFrame = {
    val byStart = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(startCol).asc, col(endCol).asc)
    val prevMaxEnd = max(col(endCol))
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    df.filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .withColumn("__new_island",
        when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L)
          .otherwise(0L))
      .withColumn("__island",
        sum(col("__new_island")).over(byStart))
      .groupBy(col(groupCol), col("__island").as("island_seq"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_merged"))
  }

  /** Hourly gap filling: densify each key's sparse event history into
    * a contiguous hour grid from its first to its last event, zero-
    * filling silent hours — the resample step before any
    * rolling-window model (a trailing mean over sparse rows silently
    * skips the silence; forecasting and anomaly baselines need the
    * zeros to exist as rows). One aggregation for per-key bounds, one
    * codegen'd `sequence` explode for the grid (rows are BORN
    * distributed on the key — never a driver loop), one left join of
    * the observed hourly rollup back onto the grid.
    *
    * The explode is the footgun at scale: a key whose history spans
    * years emits every hour of it. `maxHoursPerKey` guards with a
    * codegen'd `raise_error` — loud, per-row, no extra pass — rather
    * than silently clamping (a truncated grid looks complete and
    * poisons the downstream model).
    *
    * @param tsCol timestamp column
    * @param valCol integer measure column (cents convention)
    * @return (keyCol, hour: long epoch-hours, n_events, sum_val) */
  def fillHourlyGaps(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, maxHoursPerKey: Long = 100000L): DataFrame = {
    require(maxHoursPerKey >= 1,
      s"maxHoursPerKey must be >= 1, got $maxHoursPerKey")
    val hours = df.select(col(keyCol),
      expr(s"CAST($tsCol AS LONG) div 3600").as("__h"),
      col(valCol).as("__v"))
    val observed = hours.groupBy(col(keyCol), col("__h").as("hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("__v")).as("sum_val"))
    // the guard lives INSIDE the sequence bound (assert_true yields
    // NULL when it passes, coalesced to +0) so column pruning can
    // never optimize it away
    val grid = hours.groupBy(col(keyCol))
      .agg(min(col("__h")).as("__h0"), max(col("__h")).as("__h1"))
      .select(col(keyCol),
        explode(expr(
          s"""sequence(__h0, __h1 + CAST(coalesce(assert_true(
             |  __h1 - __h0 < ${maxHoursPerKey}L,
             |  'fillHourlyGaps: a key spans >= $maxHoursPerKey hours'
             |), 0) AS BIGINT))""".stripMargin)).as("hour"))
    grid.join(observed, Seq(keyCol, "hour"), "left")
      .select(col(keyCol), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_val"), lit(0L)).as("sum_val"))
  }

  /** Linear interpolation over a [[fillHourlyGaps]]-shaped dense grid:
    * silent rows (`nCol` = 0) get the straight line between the
    * nearest observed values on either side, INTEGER-EXACT — the
    * interpolated value is prev + ((next−prev)·Δt) div span with the
    * q205 sign-guarded division, so a falling segment (negative
    * numerator) truncates identically in Spark (`div`, toward zero)
    * and DuckDB (`//`, floor). Two ignore-nulls windows per key
    * (running last observed / upcoming first observed) — bounded
    * per-key frames, no shuffle beyond the key partitioning the grid
    * already has. Grid endpoints are observed by construction
    * (fillHourlyGaps spans first→last event), so prev/next always
    * exist on interior silent rows.
    *
    * @return grid columns + interp_val (= valCol on observed rows) */
  def interpolateLinear(grid: DataFrame, keyCol: String, hourCol: String,
      valCol: String, nCol: String): DataFrame = {
    val byHour = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(hourCol).asc)
    val wPrev = byHour.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = byHour.rowsBetween(0, Window.unboundedFollowing)
    val obsVal = when(col(nCol) > 0, col(valCol))
    val obsHour = when(col(nCol) > 0, col(hourCol))
    grid
      .withColumn("__pv", last(obsVal, ignoreNulls = true).over(wPrev))
      .withColumn("__ph", last(obsHour, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(obsVal, ignoreNulls = true).over(wNext))
      .withColumn("__nh", first(obsHour, ignoreNulls = true).over(wNext))
      .withColumn("interp_val",
        when(col(nCol) > 0, col(valCol)).otherwise(expr(
          s"""__pv + CASE
             |  WHEN (__nv - __pv) * ($hourCol - __ph) >= 0
             |    THEN ((__nv - __pv) * ($hourCol - __ph))
             |      div (__nh - __ph)
             |  ELSE -((-((__nv - __pv) * ($hourCol - __ph)))
             |      div (__nh - __ph))
             |END""".stripMargin)))
      .drop("__pv", "__ph", "__nv", "__nh")
  }

  /** Trailing-window COUNT DISTINCT per time bucket — "7-day active
    * keys as of each day", the metric a plain windowed
    * `count(distinct)` cannot express (Spark rejects DISTINCT in
    * window frames, and a collect_set frame would hold every key in
    * memory per row).
    *
    * Shape: reduce to the distinct (key, bucket) PRESENCE relation
    * (one hash shuffle, map-side combinable), fan each presence out
    * to the `windowLen` window-ends it is visible in, and dedupe
    * (key, window_end) before counting — a second hash aggregation.
    * Cost is |presence|·windowLen rows through one shuffle, linear in
    * data and window length, independent of per-bucket key counts; at
    * 100 TB both aggregations partition on composite keys with no hot
    * single-reducer stage. Only window-ends that exist as real
    * activity buckets are emitted (no trailing phantom windows).
    *
    * All-integer (bucket ids are exact longs), so any engine agrees.
    */
  def slidingDistinct(df: DataFrame, keyCol: String, bucketCol: String,
      windowLen: Int): DataFrame = {
    require(windowLen >= 1, "windowLen must be >= 1")
    val presence = df.select(col(keyCol).as("k"),
      col(bucketCol).cast("long").as("b")).distinct()
    val realBuckets = presence.select(col("b").as("window_end")).distinct()
    val fanned = presence
      .select(col("k"), explode(expr(
        s"sequence(b, b + ${windowLen - 1})")).as("window_end"))
      .distinct()
    fanned.join(realBuckets, Seq("window_end"), "left_semi")
      .groupBy(col("window_end"))
      .agg(count(lit(1)).as("n_distinct"))
  }

  /** Cumulative business-day count up to epoch-day `d` (inclusive):
    * `((d+4) div 7)*5 + least((d+4) % 7, 5)` — epoch day −3 is a
    * Monday, so d+4 both aligns the week and shifts to the inclusive
    * prefix; business days in (a, b] = h(b) − h(a). Pure integer
    * closed form (validated against a calendar brute force over 5,000
    * random spans) — no explode, no calendar table, identical text in
    * Spark and DuckDB (`div` vs `//` is the only dialect swap).
    *
    * DOMAIN: `d ≥ −4` (dates from 1969-12-28). Below that, d+4 goes
    * negative and Spark's `div` (truncates toward zero) diverges from
    * DuckDB's `//` (floors) — the floor behavior is the correct one.
    * All table dates are 1990s+, far inside the domain; callers with
    * pre-1970 data must rebase the epoch, not relax this.
    */
  def businessDayCumSql(d: String, divOp: String = "div"): String =
    s"(($d + 4) $divOp 7) * 5 + least(($d + 4) % 7, 5)"
}
