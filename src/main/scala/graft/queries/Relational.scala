package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** Core relational operator inventory (SURVEY.md §2 A/B/C/D/E/G rows).
  *
  * Each query is the Spark-first restatement of a reference operator,
  * exercised on the driver's synthetic star schema. Scale notes inline:
  * the shapes here are the ones that survive a 1000-executor / 100 TB
  * deployment (broadcast dims, partial aggregation, anti-joins instead
  * of driver-side set math).
  */
object Relational extends QueryModule {

  /** Exact-decimal bridge for hash-stable money arithmetic: the source
    * doubles are binary images of 2-dp decimals, so casting each INPUT to
    * decimal(18,2) is unambiguous in both Spark and DuckDB; all further
    * arithmetic then happens in exact decimal (order-independent), unlike
    * casting a computed double where the two engines' rounding diverges.
    */
  private def money(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val queries: Seq[Q] = Seq(

    // ---- Aggregation (SURVEY G2/G3 analog; TPC-H Q1 shape). Partial
    // aggregation (map-side combine) keeps the shuffle at |groups| rows.
    Q(
      "q01_agg_pricing",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"l_quantity").as("sum_qty"),
            sum(money($"l_extendedprice")).as("sum_base_price"),
            sum(money($"l_extendedprice") * (lit(1) - money($"l_discount")))
              .as("sum_disc_price"),
            count(lit(1)).as("count_order"),
          )
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
             |  sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),
    ),

    // ---- Scan + filter + projection (SURVEY A1/P1/B5). The predicate
    // and the 3-column ReadSchema both reach the parquet scan.
    Q(
      "q02_scan_filter_project",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp")
            && $"l_shipdate" < lit("1995-04-01").cast("timestamp")
            && $"l_discount" > lit(0.05))
          .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
             |  AND l_shipdate <  TIMESTAMP '1995-04-01'
             |  AND l_discount > 0.05""".stripMargin),
    ),

    // ---- Equi-join + aggregate (SURVEY J1 shape without merge rules).
    // customer is the small side → broadcast hash join, no shuffle of orders.
    Q(
      "q03_join_agg",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)),
            $"o_custkey" === $"c_custkey")
          .groupBy($"c_mktsegment")
          .agg(
            count(lit(1)).as("n_orders"),
            sum(money($"o_totalprice")).as("total_price"),
          )
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin),
    ),

    // ---- Multi-way star join (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
    // region). All dims broadcast; the fact table streams through one stage.
    Q(
      "q04_star_join_revenue",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
          .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(
            // Exact decimal internally (order-independent sum); DOUBLE only
            // in the output so Spark/DuckDB render identically (their
            // decimal result precisions differ: 28,2 vs 38,2).
            sum(money($"l_extendedprice") * (lit(1) - money($"l_discount")))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"),
          )
      },
      Some("""SELECT r_name, n_name,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name""".stripMargin),
    ),

    // ---- Semi-join (SURVEY J4 "ids present" / EXISTS).
    Q(
      "q05_semi_join",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(Tables.orders(s, d).select($"o_custkey"),
            $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin),
    ),

    // ---- Anti-join (SURVEY J3 "disappeared listings" / NOT EXISTS):
    // customers with no URGENT order. The filter runs before the join,
    // shrinking the build side; non-empty at every sf.
    Q(
      "q06_anti_join",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(
            Tables.orders(s, d)
              .filter($"o_orderpriority" === "1-URGENT")
              .select($"o_custkey"),
            $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin),
    ),

    // ---- Keyed dedup, last-wins (SURVEY G1: intra-batch last write wins
    // before the cross-batch merge). Window + row_number, unique-key
    // tie-break so the result is deterministic.
    Q(
      "q07_dedup_lastwins",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts".desc, $"event_id".desc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_id", $"event_type", $"value")
      },
      Some("""SELECT user_id, event_id, event_type, value FROM (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events) t WHERE rn = 1""".stripMargin),
    ),

    // ---- Running/windowed aggregate over event time (SURVEY G4 ordered
    // history analog). decimal cumsum → order-independent across engines.
    Q(
      "q08_running_total",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("running_value",
            sum(money($"value")).over(w).cast("double"))
          .select($"event_id", $"user_id", $"running_value")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
             |FROM events""".stripMargin),
    ),

    // ---- Distinct-set union (SURVEY G5/G7: scrape work-list assembly).
    Q(
      "q09_distinct_union",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        ev.filter($"event_type" === "purchase").select($"user_id")
          .union(ev.filter($"event_type" === "signup").select($"user_id"))
          .distinct()
      },
      Some("""SELECT DISTINCT user_id FROM (
             |  SELECT user_id FROM events WHERE event_type = 'purchase'
             |  UNION ALL
             |  SELECT user_id FROM events WHERE event_type = 'signup') t""".stripMargin),
    ),

    // ---- Freshness OR-filter (SURVEY P2: last 7 days relative to table
    // max — asOf comes from the data, not wall clock, for determinism).
    // Scalar "subquery" = 1-row broadcast cross join; no second scan shuffle.
    Q(
      "q10_freshness_filter",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val maxTs = ev.agg(max($"ts").as("max_ts"))
        ev.crossJoin(broadcast(maxTs))
          .filter($"ts" >= $"max_ts" - expr("INTERVAL 7 DAYS")
            || $"event_type" === "signup")
          .select($"event_id", $"user_id", $"event_type")
      },
      Some("""SELECT event_id, user_id, event_type FROM events
             |WHERE ts >= (SELECT max(ts) - INTERVAL 7 DAY FROM events)
             |   OR event_type = 'signup'""".stripMargin),
    ),

    // ---- Ordered top-k (SURVEY F17 pagination analog: one page of 28).
    // TakeOrderedAndProject — no global sort materialization.
    Q(
      "q11_topk_orders",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
          .limit(28)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 28""".stripMargin),
    ),

    // ---- Derived status column (SURVEY B4) + conditional agg.
    Q(
      "q12_status_column",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .withColumn("status",
            when($"event_type" === "error", lit("non active"))
              .otherwise(lit("active")))
          .groupBy($"status")
          .agg(
            count(lit(1)).as("n"),
            sum(money($"value")).as("total_value"),
          )
      },
      Some("""SELECT CASE WHEN event_type = 'error' THEN 'non active'
             |            ELSE 'active' END AS status,
             |  count(*) AS n,
             |  sum(CAST(value AS DECIMAL(18,2))) AS total_value
             |FROM events GROUP BY 1""".stripMargin),
    ),

    // ---- Event-time bucketing (SURVEY S-windows: tumbling 1h window as
    // date_trunc group — the batch twin of the streaming windowed agg).
    Q(
      "q13_hourly_rollup",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(date_trunc("hour", $"ts").as("hour_ts"), $"event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(money($"value")).cast("double").as("total_value"),
          )
          // Timestamp outputs render as strings: Spark parquet writes µs,
          // DuckDB→pandas lands ns — a formatted string is engine-neutral.
          .select(date_format($"hour_ts", "yyyy-MM-dd HH:mm:ss").as("hour"),
            $"event_type", $"n", $"total_value")
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             |  event_type,
             |  count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1, 2""".stripMargin),
    ),

    // ---- Sliding event-time windows (1h size, 30m slide): each event
    // lands in exactly two windows. Batch twin of the streaming sliding
    // window; oracle restates it as two shifted tumbling windows.
    Q(
      "q35_sliding_window",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "1 hour", "30 minutes").as("w"),
            $"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"value".cast("decimal(18,2)")).cast("double")
              .as("total_value"))
          .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss")
              .as("window_start"),
            $"event_type", $"n", $"total_value")
      },
      Some("""WITH s AS (
             |  SELECT make_timestamp(CAST(floor(floor(epoch(ts)) / 1800) * 1800 AS BIGINT) * 1000000)
             |    AS window_start, event_type, value FROM events
             |  UNION ALL
             |  SELECT make_timestamp((CAST(floor(floor(epoch(ts)) / 1800) * 1800 AS BIGINT) - 1800) * 1000000)
             |    AS window_start, event_type, value FROM events
             |)
             |SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
             |  event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM s GROUP BY 1, 2""".stripMargin),
    ),

    // ---- Hierarchical rollup (beyond the reference's flat groupings —
    // subtotals + grand total in one pass, partial-agg friendly).
    Q(
      "q34_rollup",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"),
            sum($"l_extendedprice".cast("decimal(18,2)")).as("total"))
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS total
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin),
    ),

    // ---- Grouped count + fan-out math (SURVEY G2 + F17:
    // total_pages = ceil(n / 28)).
    Q(
      "q14_pagination_math",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"))
          .withColumn("total_pages", ceil($"n" / lit(28)))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(ceil(count(*) / 28.0) AS BIGINT) AS total_pages
             |FROM events GROUP BY event_type""".stripMargin),
    ),

    // ---- as-of (point-in-time) join: every non-purchase event sees the
    // user's most recent purchase AT OR BEFORE its own timestamp (the
    // feature-store join; a later purchase leaking in is the classic
    // label-contamination bug). Spark has no native operator — the
    // union+running-last form costs one key shuffle (TemporalJoins
    // scaladoc); DuckDB restates it with its built-in ASOF JOIN, an
    // entirely independent implementation (sorted merge).
    Q(
      "q71_asof_join",
      (s, d) => {
        import s.implicits._
        val events = Tables.events(s, d)
        val out = graft.ops.TemporalJoins.asOfJoin(
          events.filter($"event_type" =!= "purchase")
            .select($"event_id", $"user_id", $"ts", $"value"),
          events.filter($"event_type" === "purchase")
            .select($"user_id", $"ts", $"value"),
          "user_id", "ts", Seq("value"))
        out.select($"event_id", $"user_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts"),
          $"value",
          date_format($"asof_ts", "yyyy-MM-dd HH:mm:ss").as("asof_ts"),
          $"asof_value")
      },
      Some("""WITH r AS (
             |  SELECT user_id, ts, value FROM events
             |  WHERE event_type = 'purchase'
             |), l AS (
             |  SELECT event_id, user_id, ts, value FROM events
             |  WHERE event_type <> 'purchase'
             |)
             |SELECT l.event_id, l.user_id,
             |  strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts,
             |  l.value,
             |  strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS asof_ts,
             |  r.value AS asof_value
             |FROM l ASOF LEFT JOIN r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin),
    ),

    // ---- range (interval) join, NO equi-key — the shape Catalyst
    // plans as a nested loop: every event inside any purchase's ±5 min
    // attribution window. Spark side runs the binned decomposition
    // (equality shuffle on 5-min buckets + exact post-filter,
    // TemporalJoins scaladoc); DuckDB restates the bare quadratic
    // BETWEEN — equal output proves the binning loses nothing.
    Q(
      "q72_range_join",
      (s, d) => {
        import s.implicits._
        val events = Tables.events(s, d)
        val points = events.filter($"event_type" =!= "purchase")
          .select($"event_id", $"ts")
        val windows = events.filter($"event_type" === "purchase")
          .select($"event_id".as("purchase_id"),
            ($"ts" - expr("INTERVAL 5 MINUTES")).as("start_ts"),
            ($"ts" + expr("INTERVAL 5 MINUTES")).as("end_ts"))
        graft.ops.TemporalJoins
          .rangeJoin(points, windows, "ts", "start_ts", "end_ts", 300L)
          .select($"event_id", $"purchase_id")
      },
      Some("""SELECT p.event_id, i.event_id AS purchase_id
             |FROM events p
             |JOIN (SELECT event_id, ts FROM events
             |      WHERE event_type = 'purchase') i
             |  ON p.ts BETWEEN i.ts - INTERVAL 5 MINUTE
             |             AND i.ts + INTERVAL 5 MINUTE
             |WHERE p.event_type <> 'purchase'""".stripMargin),
    ),

    // ---- CUBE: all four grouping combinations (status×priority,
    // status, priority, grand total) in one pass. Spark expands the
    // grouping sets BEFORE the shuffle and partial-aggregates each, so
    // the shuffle carries |groups| rows per set, not the fact table —
    // the same one-pass subtotal shape as q34's ROLLUP. grouping_id
    // disambiguates a real NULL key from a subtotal row.
    Q(
      "q190_cube_subtotals",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(grouping_id().as("gid"),
            count(lit(1)).as("n"),
            // exact decimal internally, DOUBLE at the output (the :104
            // convention) — DECIMAL(28,2) vs DuckDB's float rendering
            // hash-mismatched on trailing zeros (r7 q190 red row)
            sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
              .as("total"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  GROUPING(o_orderstatus, o_orderpriority) AS gid,
             |  count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders
             |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin),
    ),

    // ---- PIVOT: long→wide reshape (order status counts as columns
    // per market segment). Spark's pivot with an EXPLICIT value list —
    // without one it runs a driver-side distinct scan to discover the
    // columns, which at 100 TB is a full extra pass; the closed status
    // domain {F,O,P} is schema knowledge, so declare it. The oracle
    // restates the reshape as portable FILTER aggregates.
    Q(
      "q191_pivot_status",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)),
            $"o_custkey" === $"c_custkey")
          .groupBy($"c_mktsegment")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select($"c_mktsegment",
            coalesce($"F", lit(0L)).as("n_f"),
            coalesce($"O", lit(0L)).as("n_o"),
            coalesce($"P", lit(0L)).as("n_p"))
      },
      Some("""SELECT c_mktsegment,
             |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
             |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin),
    ),

    // ---- top-N per group (the "every dashboard has one" operator):
    // 3 priciest lineitems per supplier. One hash shuffle on the group
    // key, then a per-partition sort-and-rank — no global sort; groups
    // are numerous (|suppliers|) so the window parallelizes across the
    // cluster. Ties broken by the (orderkey, linenumber) unique key so
    // both engines pick identical survivors.
    Q(
      "q192_topn_per_group",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_extendedprice".desc, $"l_orderkey".asc,
            $"l_linenumber".asc)
        Tables.lineitem(s, d)
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
            $"l_extendedprice")
          .withColumn("rn", row_number().over(w).cast("int"))
          .filter($"rn" <= 3)
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             |  CAST(rn AS INT) AS rn
             |FROM (
             |  SELECT *, row_number() OVER (PARTITION BY l_suppkey
             |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
             |    AS rn
             |  FROM lineitem)
             |WHERE rn <= 3""".stripMargin),
    ),

    // ---- ordered conversion funnel (signup → view → click →
    // purchase): each stage's entry time is the user's first qualifying
    // event AT OR AFTER the previous stage's entry — the order
    // constraint that separates a funnel from four independent counts.
    // Four (filter → per-user min) aggregations chained by broadcast-
    // sized joins on user_id: each stage frame is ≤ |users| rows, so
    // after the first events-scan aggregation everything is dimension-
    // sized; no window over the raw event stream.
    Q(
      "q193_funnel",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        def firstAtOrAfter(stage: String, prev: DataFrame,
            prevTs: String, outTs: String): DataFrame =
          ev.filter($"event_type" === stage)
            .join(prev, "user_id")
            .filter($"ts" >= col(prevTs))
            .groupBy($"user_id").agg(min($"ts").as(outTs))
        val s1 = ev.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"ts").as("t1"))
        val s2 = firstAtOrAfter("view", s1, "t1", "t2")
        val s3 = firstAtOrAfter("click", s2, "t2", "t3")
        val s4 = firstAtOrAfter("purchase", s3, "t3", "t4")
        def stageRow(n: Int, name: String, df: DataFrame): DataFrame =
          df.agg(count(lit(1)).as("users"))
            .select(lit(n).as("stage"), lit(name).as("stage_name"),
              $"users")
        stageRow(1, "signup", s1)
          .unionAll(stageRow(2, "view", s2))
          .unionAll(stageRow(3, "click", s3))
          .unionAll(stageRow(4, "purchase", s4))
      },
      Some("""WITH s1 AS (
             |  SELECT user_id, min(ts) AS t1 FROM events
             |  WHERE event_type = 'signup' GROUP BY 1
             |), s2 AS MATERIALIZED (
             |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
             |  JOIN s1 USING (user_id)
             |  WHERE e.event_type = 'view' AND e.ts >= s1.t1 GROUP BY 1
             |), s3 AS MATERIALIZED (
             |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
             |  JOIN s2 USING (user_id)
             |  WHERE e.event_type = 'click' AND e.ts >= s2.t2 GROUP BY 1
             |), s4 AS MATERIALIZED (
             |  SELECT e.user_id, min(e.ts) AS t4 FROM events e
             |  JOIN s3 USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts >= s3.t3 GROUP BY 1
             |)
             |SELECT 1 AS stage, 'signup' AS stage_name,
             |  (SELECT count(*) FROM s1) AS users
             |UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
             |UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
             |UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4)"""
        .stripMargin),
    ),

    // ---- cohort retention: users grouped by first-seen week, counted
    // in each subsequent activity week. Two aggregations off the same
    // scan (per-user first event; per-user-week activity) joined on
    // user_id — the cohort frame is |users|-sized, so the join
    // broadcasts; distinct-user counts partial-aggregate per
    // (cohort, offset). Both week anchors are Monday-truncated, so the
    // day delta is an exact multiple of 7 in both engines.
    Q(
      "q194_cohort_retention",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val cohort = ev.groupBy($"user_id")
          .agg(date_trunc("week", min($"ts")).as("cohort_week"))
        val active = ev
          .select($"user_id", date_trunc("week", $"ts").as("week"))
          .distinct()
        active.join(broadcast(cohort), "user_id")
          .groupBy($"cohort_week",
            (datediff($"week", $"cohort_week") / 7).cast("int")
              .as("week_offset"))
          .agg(count(lit(1)).as("users"))
          .select(date_format($"cohort_week", "yyyy-MM-dd")
              .as("cohort_week"),
            $"week_offset", $"users")
      },
      Some("""WITH cohort AS (
             |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
             |  FROM events GROUP BY 1
             |), active AS (
             |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week
             |  FROM events
             |)
             |SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
             |  CAST(date_diff('day', cohort_week, week) // 7 AS INT)
             |    AS week_offset,
             |  count(*) AS users
             |FROM active JOIN cohort USING (user_id)
             |GROUP BY 1, 2""".stripMargin),
    ),

    // ---- event-type transition matrix (first-order Markov counts):
    // consecutive event pairs per user, ordered by (ts, event_id) —
    // the unique-key tiebreak keeps both engines' successor choice
    // identical when timestamps collide. The lead window partitions by
    // user_id (many users → cluster-wide parallelism; per-user event
    // counts are bounded), then one |types|²-row aggregation.
    Q(
      "q195_markov_transitions",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts".asc, $"event_id".asc)
        Tables.events(s, d)
          .select($"user_id", $"event_type", $"ts", $"event_id")
          .withColumn("next_type", lead($"event_type", 1).over(w))
          .filter($"next_type".isNotNull)
          .groupBy($"event_type".as("from_type"),
            $"next_type".as("to_type"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH t AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS to_type
             |  FROM events
             |)
             |SELECT from_type, to_type, count(*) AS n FROM t
             |WHERE to_type IS NOT NULL GROUP BY 1, 2""".stripMargin),
    ),

    // ---- global NTILE (price deciles): equi-depth bucketing over a
    // TOTAL order without the single-partition window `ntile(10) OVER
    // (ORDER BY …)` would plan — the rank comes from the two-pass
    // range-partitioned scan and the tile is integer math replaying
    // SQL NTILE's first-buckets-get-the-remainder contract. The
    // oracle runs DuckDB's real ntile() — equal output proves the
    // distributed restatement is exactly NTILE.
    Q(
      "q200_global_ntile",
      (s, d) => {
        import s.implicits._
        graft.ops.SketchStats.globalNtile(
          Tables.lineitem(s, d)
            .select($"l_orderkey", $"l_linenumber", $"l_extendedprice"),
          Seq($"l_extendedprice".asc, $"l_orderkey".asc,
            $"l_linenumber".asc),
          k = 10)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice,
             |  CAST(ntile(10) OVER (ORDER BY l_extendedprice,
             |    l_orderkey, l_linenumber) AS INT) AS tile
             |FROM lineitem""".stripMargin),
    ),

    // ---- per-group OLS (price vs quantity slope per supplier): exact
    // decimal sufficient statistics (order-free addition — double sums
    // differ in the last ulp between Spark's agg tree and a serial
    // engine), one final fixed IEEE formula both engines replay
    // operation for operation.
    Q(
      "q201_grouped_ols",
      (s, d) => {
        import s.implicits._
        // integer-scaled inputs by the op's contract: quantity is
        // already integral, price goes to cents via the exact (18,2)
        // money cast; slope/intercept come back in cents and one final
        // /100.0 (replayed identically by the oracle) restores units
        val scaled = Tables.lineitem(s, d).select($"l_suppkey",
          $"l_quantity".as("x"),
          ($"l_extendedprice".cast("decimal(18,2)") * 100)
            .cast("long").as("y_cents"))
        graft.ops.SketchStats.groupedOls(scaled, "l_suppkey", "x",
            "y_cents")
          .select($"l_suppkey", $"n", ($"slope" / 100.0).as("slope"),
            ($"intercept" / 100.0).as("intercept"))
      },
      Some("""WITH b AS (
             |  SELECT l_suppkey, CAST(l_quantity AS DECIMAL(19,0)) AS x,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             |      AS DECIMAL(19,0)) AS y
             |  FROM lineitem
             |), s AS (
             |  SELECT l_suppkey, count(*) AS n, sum(x) AS sx,
             |    sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
             |  FROM b GROUP BY 1
             |), v AS (
             |  -- same deterministic 2^32 hi/lo split as the Spark side
             |  -- (see SketchStats.splitToDouble)
             |  SELECT l_suppkey, n, CAST(n AS DOUBLE) AS nd,
             |    (CASE WHEN sx < 0 THEN -1 ELSE 1 END) * (CAST(CAST(abs(sx) AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(abs(sx) AS HUGEINT) % 4294967296 AS DOUBLE)) AS sxd,
             |    (CASE WHEN sy < 0 THEN -1 ELSE 1 END) * (CAST(CAST(abs(sy) AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(abs(sy) AS HUGEINT) % 4294967296 AS DOUBLE)) AS syd,
             |    (CASE WHEN sxy < 0 THEN -1 ELSE 1 END) * (CAST(CAST(abs(sxy) AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(abs(sxy) AS HUGEINT) % 4294967296 AS DOUBLE)) AS sxyd,
             |    (CASE WHEN sxx < 0 THEN -1 ELSE 1 END) * (CAST(CAST(abs(sxx) AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(abs(sxx) AS HUGEINT) % 4294967296 AS DOUBLE)) AS sxxd
             |  FROM s
             |), o AS (
             |  SELECT l_suppkey, n,
             |    CASE WHEN n >= 2 AND nd * sxxd - sxd * sxd <> 0
             |      THEN (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
             |    END AS slope_c,
             |    nd, sxd, syd FROM v
             |)
             |SELECT l_suppkey, n, slope_c / 100.0 AS slope,
             |  CASE WHEN slope_c IS NOT NULL
             |    THEN ((syd - slope_c * sxd) / nd) / 100.0 END AS intercept
             |FROM o""".stripMargin),
    ),

    // ---- Pearson correlation matrix over three measures in ONE scan
    // (the data-quality feature-correlation card): integer-scaled
    // sufficient statistics (quantity as-is, price/discount in cents —
    // r is scale-invariant), final fixed IEEE formula; sqrt is
    // correctly rounded so r matches bitwise cross-engine.
    Q(
      "q202_pearson_matrix",
      (s, d) => {
        import s.implicits._
        graft.ops.SketchStats.pearsonPairs(
          Tables.lineitem(s, d).select(
            $"l_quantity",
            ($"l_extendedprice".cast("decimal(18,2)") * 100)
              .cast("long").as("l_extendedprice"),
            ($"l_discount".cast("decimal(18,2)") * 100)
              .cast("long").as("l_discount")),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
      },
      Some("""WITH b AS (
             |  SELECT CAST(l_quantity AS DECIMAL(19,0)) AS x0,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             |      AS DECIMAL(19,0)) AS x1,
             |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
             |      AS DECIMAL(19,0)) AS x2
             |  FROM lineitem
             |), s AS (
             |  SELECT count(*) AS n,
             |    sum(x0) AS s0, sum(x0 * x0) AS q0,
             |    sum(x1) AS s1, sum(x1 * x1) AS q1,
             |    sum(x2) AS s2, sum(x2 * x2) AS q2,
             |    sum(x0 * x1) AS p01, sum(x0 * x2) AS p02,
             |    sum(x1 * x2) AS p12
             |  FROM b
             |), v AS (
             |  -- exact sums reach DOUBLE through the same 2^32 hi/lo
             |  -- split as the Spark side: past 2^53 the native
             |  -- big-decimal casts disagree by 1 ulp across engines,
             |  -- while the split leaves only IEEE-correct mul/add
             |  SELECT n, CAST(n AS DOUBLE) AS nd,
             |    (CASE WHEN s0 < 0 THEN -1 ELSE 1 END) * (CAST(CAST(abs(s0) AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(abs(s0) AS HUGEINT) % 4294967296 AS DOUBLE)) AS s0,
             |    (CASE WHEN q0 < 0 THEN -1 ELSE 1 END) * (CAST(CAST(abs(q0) AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(abs(q0) AS HUGEINT) % 4294967296 AS DOUBLE)) AS q0,
             |    (CASE WHEN s1 < 0 THEN -1 ELSE 1 END) * (CAST(CAST(abs(s1) AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(abs(s1) AS HUGEINT) % 4294967296 AS DOUBLE)) AS s1,
             |    (CASE WHEN q1 < 0 THEN -1 ELSE 1 END) * (CAST(CAST(abs(q1) AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(abs(q1) AS HUGEINT) % 4294967296 AS DOUBLE)) AS q1,
             |    (CASE WHEN s2 < 0 THEN -1 ELSE 1 END) * (CAST(CAST(abs(s2) AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(abs(s2) AS HUGEINT) % 4294967296 AS DOUBLE)) AS s2,
             |    (CASE WHEN q2 < 0 THEN -1 ELSE 1 END) * (CAST(CAST(abs(q2) AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(abs(q2) AS HUGEINT) % 4294967296 AS DOUBLE)) AS q2,
             |    (CASE WHEN p01 < 0 THEN -1 ELSE 1 END) * (CAST(CAST(abs(p01) AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(abs(p01) AS HUGEINT) % 4294967296 AS DOUBLE)) AS p01,
             |    (CASE WHEN p02 < 0 THEN -1 ELSE 1 END) * (CAST(CAST(abs(p02) AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(abs(p02) AS HUGEINT) % 4294967296 AS DOUBLE)) AS p02,
             |    (CASE WHEN p12 < 0 THEN -1 ELSE 1 END) * (CAST(CAST(abs(p12) AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(abs(p12) AS HUGEINT) % 4294967296 AS DOUBLE)) AS p12
             |  FROM s
             |)
             |SELECT 'l_quantity' AS var_a, 'l_extendedprice' AS var_b, n,
             |  CASE WHEN nd*q0 - s0*s0 > 0 AND nd*q1 - s1*s1 > 0
             |    THEN (nd*p01 - s0*s1)
             |      / (sqrt(nd*q0 - s0*s0) * sqrt(nd*q1 - s1*s1)) END AS r
             |FROM v
             |UNION ALL
             |SELECT 'l_quantity', 'l_discount', n,
             |  CASE WHEN nd*q0 - s0*s0 > 0 AND nd*q2 - s2*s2 > 0
             |    THEN (nd*p02 - s0*s2)
             |      / (sqrt(nd*q0 - s0*s0) * sqrt(nd*q2 - s2*s2)) END
             |FROM v
             |UNION ALL
             |SELECT 'l_extendedprice', 'l_discount', n,
             |  CASE WHEN nd*q1 - s1*s1 > 0 AND nd*q2 - s2*s2 > 0
             |    THEN (nd*p12 - s1*s2)
             |      / (sqrt(nd*q1 - s1*s1) * sqrt(nd*q2 - s2*s2)) END
             |FROM v""".stripMargin),
    ),

    // ---- peak concurrency per event type (sweep line): every event
    // opens a 10-minute [ts, ts+10m) interval; the +1/−1 boundary
    // walk's running max is the load-planning number. Half-open
    // semantics pinned by the (t, d) sort — an interval ending exactly
    // when another starts never overlaps.
    Q(
      "q203_max_concurrency",
      (s, d) => {
        import s.implicits._
        graft.ops.TemporalJoins.maxConcurrency(
          Tables.events(s, d).select($"event_type", $"ts".as("start_ts"),
            ($"ts" + expr("INTERVAL 10 MINUTES")).as("end_ts")),
          "event_type", "start_ts", "end_ts")
      },
      Some("""WITH b AS (
             |  SELECT event_type, ts AS t, 1 AS d FROM events
             |  UNION ALL
             |  SELECT event_type, ts + INTERVAL 10 MINUTE, -1 FROM events
             |), r AS (
             |  SELECT event_type,
             |    sum(d) OVER (PARTITION BY event_type ORDER BY t, d)
             |      AS run
             |  FROM b
             |)
             |SELECT event_type, CAST(max(run) AS BIGINT) AS max_concurrent
             |FROM r GROUP BY 1""".stripMargin),
    ),

    // ---- rolling 3-event window per user (ROWS BETWEEN 2 PRECEDING):
    // the moving-average smoother, kept exact — cents in the window
    // sum, integer avg — so both engines agree bitwise. Window
    // partitions by user (many users); the frame is row-based, so
    // boundary rows average over fewer events by SQL's own contract.
    Q(
      "q211_rolling_avg",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts".asc, $"event_id".asc)
          .rowsBetween(-2, 0)
        Tables.events(s, d)
          .select($"user_id", $"event_id", $"ts",
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents"))
          .withColumn("w_n", count(lit(1)).over(w))
          .withColumn("w_sum_cents", sum($"cents").over(w))
          .withColumn("w_avg_cents", expr("w_sum_cents div w_n"))
          .drop("ts")
      },
      // the division is sign-guarded on the oracle side (q205's CASE):
      // Spark `div` truncates toward zero while DuckDB `//` floors, so
      // a negative window sum would otherwise diverge by one cent —
      // latent on this strictly-positive fixture, pinned anyway
      Some("""WITH v AS (
             |  SELECT user_id, event_id, ts,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events
             |), f AS (
             |  SELECT user_id, event_id, cents,
             |    CAST(count(*) OVER w AS BIGINT) AS w_n,
             |    CAST(sum(cents) OVER w AS BIGINT) AS w_sum_cents
             |  FROM v
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             |)
             |SELECT user_id, event_id, cents, w_n, w_sum_cents,
             |  CASE WHEN w_sum_cents >= 0 THEN w_sum_cents // w_n
             |       ELSE -((-w_sum_cents) // w_n) END AS w_avg_cents
             |FROM f""".stripMargin),
    ),

    // ---- funnel conversion latency: signup → first purchase delay in
    // whole seconds, EXACT p50/p90 via the histogram-refinement
    // distributed selection (SketchStats.exactQuantilesLong — no
    // single-partition sort, ≤ ~7 passes at any scale). Seconds come
    // from unix_timestamp (floor) on both engines — q35's epoch/floor
    // convention.
    Q(
      "q213_funnel_latency",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val s1 = ev.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"ts").as("t1"))
        val s4 = ev.filter($"event_type" === "purchase")
          .join(s1, "user_id").filter($"ts" >= $"t1")
          .groupBy($"user_id").agg(min($"ts").as("t4"))
        val delays = s4.join(s1, "user_id")
          .select((unix_timestamp($"t4") - unix_timestamp($"t1"))
            .as("delay_s"))
        graft.ops.SketchStats.exactQuantilesLong(delays, "delay_s",
          Seq(0.5, 0.9))
      },
      Some("""WITH s1 AS (
             |  SELECT user_id, min(ts) AS t1 FROM events
             |  WHERE event_type = 'signup' GROUP BY 1
             |), s4 AS (
             |  SELECT e.user_id, min(e.ts) AS t4 FROM events e
             |  JOIN s1 USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts >= s1.t1
             |  GROUP BY 1
             |), dl AS (
             |  SELECT CAST(floor(epoch(t4)) AS BIGINT)
             |    - CAST(floor(epoch(t1)) AS BIGINT) AS delay_s
             |  FROM s4 JOIN s1 USING (user_id)
             |), r AS (
             |  SELECT delay_s, row_number() OVER (ORDER BY delay_s) AS rn
             |  FROM dl
             |), n AS (SELECT count(*) AS c FROM dl)
             |SELECT 0.5 AS p, (SELECT delay_s FROM r, n
             |  WHERE rn = CAST(ceil(0.5 * c) AS BIGINT)) AS value
             |UNION ALL
             |SELECT 0.9, (SELECT delay_s FROM r, n
             |  WHERE rn = CAST(ceil(0.9 * c) AS BIGINT))""".stripMargin),
    ),

    // ---- bag-semantics set operators (INTERSECT ALL / EXCEPT ALL):
    // the multiplicity-aware algebra the join-based set ops (G5–G7)
    // don't cover — Spark plans both as an aggregate of signed
    // multiplicities + generate (one shuffle each side, no join
    // explosion), and DuckDB's native bag operators pin the
    // semantics: min(m_a, m_b) copies / max(m_a − m_b, 0) copies.
    Q(
      "q214_bag_set_ops",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val a = li.filter($"l_returnflag" === "R").select($"l_partkey")
        val b = li.filter($"l_linestatus" === "F").select($"l_partkey")
        a.intersectAll(b)
          .select(lit("intersect_all").as("op"), $"l_partkey")
          .unionAll(a.exceptAll(b)
            .select(lit("except_all").as("op"), $"l_partkey"))
      },
      Some("""SELECT 'intersect_all' AS op, l_partkey FROM (
             |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
             |  INTERSECT ALL
             |  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F')
             |UNION ALL
             |SELECT 'except_all', l_partkey FROM (
             |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
             |  EXCEPT ALL
             |  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F')"""
        .stripMargin),
    ),

    // ---- UNPIVOT / melt, the inverse of q191's PIVOT: wide measure
    // columns to (measure, value) rows via Spark's native
    // Dataset.unpivot (plans as a Generate/Expand riding the scan —
    // pure map-side, ×|measures| rows, no shuffle) vs DuckDB's native
    // UNPIVOT. Measures pre-cast to the exact money decimal so both
    // engines emit identical values.
    Q(
      "q215_unpivot_measures",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_linenumber",
            $"l_quantity".cast("decimal(18,2)").as("l_quantity"),
            $"l_extendedprice".cast("decimal(18,2)")
              .as("l_extendedprice"),
            $"l_discount".cast("decimal(18,2)").as("l_discount"))
          .unpivot(
            Array($"l_orderkey", $"l_linenumber"),
            Array($"l_quantity", $"l_extendedprice", $"l_discount"),
            "measure", "value")
          // decimal pre-cast fixes the VALUES on both engines; double
          // post-cast fixes the RENDERING (DECIMAL(18,2) trailing
          // zeros hash-mismatched 71,793 cells in r7 despite zero
          // numeric differences — the :104 convention)
          .withColumn("value", $"value".cast("double"))
      },
      Some("""SELECT l_orderkey, l_linenumber, measure,
             |  CAST(value AS DOUBLE) AS value FROM (
             |  SELECT l_orderkey, l_linenumber,
             |    CAST(l_quantity AS DECIMAL(18,2)) AS l_quantity,
             |    CAST(l_extendedprice AS DECIMAL(18,2))
             |      AS l_extendedprice,
             |    CAST(l_discount AS DECIMAL(18,2)) AS l_discount
             |  FROM lineitem)
             |UNPIVOT (value FOR measure
             |  IN (l_quantity, l_extendedprice, l_discount))"""
        .stripMargin),
    ),

    // ---- SCD2 history build (Kimball slowly-changing-dimension type
    // 2): each user's event_type stream collapses to CHANGE POINTS
    // with validity intervals — valid_from at the change, valid_to at
    // the next change (NULL + is_current on the open row). The CDC→
    // warehouse-history materialization every dimension table needs;
    // two windows partitioned by the key (users numerous — no global
    // window), change detection via lag, interval close via lead OVER
    // THE FILTERED change-point frame (lead over the raw frame would
    // close intervals at non-changes). Ties pin on event_id.
    Q(
      "q223_scd2_history",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts".asc, $"event_id".asc)
        val changes = Tables.events(s, d)
          .select($"user_id", $"event_type", $"ts", $"event_id")
          .withColumn("__prev", lag($"event_type", 1).over(w))
          .filter($"__prev".isNull || $"__prev" =!= $"event_type")
        val w2 = Window.partitionBy($"user_id")
          .orderBy($"ts".asc, $"event_id".asc)
        changes
          .withColumn("change_seq", row_number().over(w2))
          .withColumn("valid_to_ts", lead($"ts", 1).over(w2))
          .select($"user_id", $"event_type",
            date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("valid_from"),
            date_format($"valid_to_ts", "yyyy-MM-dd HH:mm:ss")
              .as("valid_to"),
            $"valid_to_ts".isNull.as("is_current"),
            $"change_seq")
      },
      Some("""WITH marked AS (
             |  SELECT user_id, event_type, ts, event_id,
             |    lag(event_type) OVER w AS prev
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), changes AS (
             |  SELECT user_id, event_type, ts, event_id FROM marked
             |  WHERE prev IS NULL OR prev <> event_type
             |), iv AS (
             |  SELECT user_id, event_type, ts,
             |    CAST(row_number() OVER w2 AS INT) AS change_seq,
             |    lead(ts) OVER w2 AS valid_to_ts
             |  FROM changes
             |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
             |)
             |SELECT user_id, event_type,
             |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
             |  strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
             |  valid_to_ts IS NULL AS is_current,
             |  change_seq
             |FROM iv""".stripMargin),
    ),

    // ---- time-RANGE window frame (trailing one hour per user), the
    // value-based sibling of q211's row-based frame: RANGE includes
    // ALL peers of the current ordering value, so the result is
    // deterministic under same-second ties without any tie-break
    // column — both engines frame on the same floor-seconds key
    // (q35's epoch/floor convention). Exact cents sum; the window
    // partitions by user (bounded per-key history, cluster-wide
    // parallelism, never an unpartitioned frame).
    Q(
      "q216_time_range_window",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"sec")
          .rangeBetween(-3600, Window.currentRow)
        Tables.events(s, d)
          .select($"user_id", $"event_id", $"ts".cast("long").as("sec"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents"))
          .withColumn("hour_sum_cents", sum($"cents").over(w))
          .withColumn("hour_n", count(lit(1)).over(w))
          .drop("cents")
      },
      Some("""WITH v AS (
             |  SELECT user_id, event_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events
             |)
             |SELECT user_id, event_id, sec,
             |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY sec
             |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS hour_sum_cents,
             |  count(*) OVER (PARTITION BY user_id ORDER BY sec
             |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             |    AS hour_n
             |FROM v""".stripMargin),
    ),

    // ---- explicit GROUPING SETS (mixed arity + grand total),
    // completing the grouping-set family next to q34's ROLLUP and
    // q190's CUBE: unlike CUBE it enumerates ONLY the requested sets,
    // so the expand factor is |sets| (here 3), not 2^k — the shape to
    // reach for at 100 TB when a dashboard needs two specific
    // subtotal levels, not every combination. Same one-pass expand +
    // partial-aggregate plan as q190: the shuffle carries |groups|
    // rows per set. grouping_id() disambiguates subtotal rows from
    // real NULL keys; money stays exact decimal internally, DOUBLE at
    // the output (the :104 convention).
    Q(
      "q224_grouping_sets",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupingSets(
            Seq(Seq($"o_orderstatus"),
              Seq($"o_orderstatus", $"o_orderpriority"),
              Seq.empty),
            $"o_orderstatus", $"o_orderpriority")
          .agg(grouping_id().as("gid"),
            count(lit(1)).as("n"),
            sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
              .as("total"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  GROUPING(o_orderstatus, o_orderpriority) AS gid,
             |  count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus),
             |  (o_orderstatus, o_orderpriority), ())""".stripMargin),
    ),

    // ---- gaps-and-islands: each event opens a 10-minute activity
    // lease; overlapping-or-touching leases per user merge into
    // maximal covered islands (TemporalJoins.mergeIntervals — two
    // per-user windows + one aggregation; the coverage complement of
    // q203's concurrency depth). Epoch-seconds integers end to end
    // (the q35 floor convention), so island bounds hash identically.
    Q(
      "q225_interval_coverage",
      (s, d) => {
        import s.implicits._
        graft.ops.TemporalJoins.mergeIntervals(
          Tables.events(s, d).select($"user_id",
            $"ts".cast("long").as("lease_start"),
            ($"ts".cast("long") + 600L).as("lease_end")),
          "user_id", "lease_start", "lease_end")
      },
      Some("""WITH iv AS (
             |  SELECT user_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS s,
             |    CAST(floor(epoch(ts)) AS BIGINT) + 600 AS e
             |  FROM events
             |), m AS (
             |  SELECT user_id, s, e,
             |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS pmax
             |  FROM iv
             |), f AS (
             |  SELECT user_id, s, e,
             |    CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END
             |      AS brk
             |  FROM m
             |), g AS (
             |  SELECT user_id, s, e,
             |    sum(brk) OVER (PARTITION BY user_id ORDER BY s, e)
             |      AS island_seq
             |  FROM f
             |)
             |SELECT user_id, CAST(island_seq AS BIGINT) AS island_seq,
             |  min(s) AS island_start, max(e) AS island_end,
             |  count(*) AS n_merged
             |FROM g GROUP BY 1, 2""".stripMargin),
    ),

    // ---- triangle counting on the co-purchase graph (parts sharing
    // an order), via GraphOps.triangleCounts' degree-ordered node
    // iterator: every edge orients from its (deg, id)-smaller
    // endpoint, bounding any node's oriented out-degree by O(√m), so
    // the wedge join is O(m^{3/2}) TOTAL regardless of hub skew — the
    // shape that survives a power-law degree distribution at 100 TB,
    // where naive wedge enumeration dies on the last reducer. The
    // oracle restates the count as the canonical a<b<c three-way
    // self-join.
    Q(
      "q226_triangle_count",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_partkey")
        val edges = li.as("x").join(li.as("y"),
            $"x.l_orderkey" === $"y.l_orderkey"
              && $"x.l_partkey" < $"y.l_partkey")
          .select($"x.l_partkey".as("src"), $"y.l_partkey".as("dst"))
        graft.ops.GraphOps.triangleCounts(edges)
      },
      Some("""WITH e0 AS (
             |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
             |  FROM lineitem x JOIN lineitem y
             |    ON x.l_orderkey = y.l_orderkey
             |   AND x.l_partkey < y.l_partkey
             |), nodes AS (
             |  SELECT a AS node FROM e0 UNION SELECT b FROM e0
             |), tri AS (
             |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |  FROM e0 e1
             |  JOIN e0 e2 ON e2.a = e1.b
             |  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
             |), corners AS (
             |  SELECT x AS node FROM tri
             |  UNION ALL SELECT y FROM tri
             |  UNION ALL SELECT z FROM tri
             |)
             |SELECT n.node, count(c.node) AS n_triangles
             |FROM nodes n LEFT JOIN corners c ON c.node = n.node
             |GROUP BY 1""".stripMargin),
    ),

    // ---- event-sequence pattern match (the MATCH_RECOGNIZE shape):
    // per user, the ts-ordered event-type string is scanned for the
    // browse-to-buy pattern `v[vc]*p` — a view, any further
    // views/clicks, then a purchase. Per-user state is ONE bounded
    // string (events of one user), built by sort_array over a
    // collect_list — partitioned by user across the cluster, never a
    // global sort; the regex scan itself is leftmost, non-overlapping
    // in both engines (no alternation ambiguity in the pattern, so
    // backtracking [Java] and automaton [RE2] semantics coincide).
    Q(
      "q227_event_pattern",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"user_id",
            struct($"ts", $"event_id",
              substring($"event_type", 1, 1).as("c")).as("ev"))
          .groupBy($"user_id")
          .agg(array_join(
            expr("transform(sort_array(collect_list(ev)), e -> e.c)"),
            "").as("seq"))
          .select($"user_id",
            length($"seq").as("n_events"),
            regexp_count($"seq", lit("v[vc]*p")).cast("long")
              .as("n_funnels"),
            regexp_extract($"seq", "v[vc]*p", 0).as("first_funnel"))
      },
      Some("""WITH s AS (
             |  SELECT user_id,
             |    string_agg(substr(event_type, 1, 1), ''
             |      ORDER BY ts, event_id) AS seq
             |  FROM events GROUP BY 1
             |)
             |SELECT user_id,
             |  CAST(length(seq) AS INTEGER) AS n_events,
             |  CAST(len(regexp_extract_all(seq, 'v[vc]*p')) AS BIGINT)
             |    AS n_funnels,
             |  coalesce(regexp_extract(seq, 'v[vc]*p', 0), '')
             |    AS first_funnel
             |FROM s""".stripMargin),
    ),

    // ---- rolling anomaly flags, INTEGER-EXACT: each event is tested
    // against the mean ± 2σ band of its user's previous 8 events
    // without ever computing a float mean or a square root — the
    // z-score inequality (x−μ)² > 4σ² multiplies out to
    // (n·x − S)² > 4·(n·Q − S²) with S = Σcents, Q = Σcents², all
    // BIGINT, so the flag is bit-identical in any engine (a float
    // μ/σ version would flip boundary rows between engines). The
    // trailing frame EXCLUDES the current row — an outlier must not
    // vote on its own baseline. Windows partition by user: bounded
    // per-key history, cluster-wide parallelism.
    Q(
      "q237_rolling_anomaly",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts".asc, $"event_id".asc)
          .rowsBetween(-8, -1)
        Tables.events(s, d)
          .select($"user_id", $"event_id",
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents"), $"ts")
          .withColumn("w_n", count(lit(1)).over(w))
          .withColumn("w_sum", coalesce(sum($"cents").over(w), lit(0L)))
          .withColumn("w_sumsq",
            coalesce(sum($"cents" * $"cents").over(w), lit(0L)))
          .withColumn("is_anomaly",
            $"w_n" >= 4 &&
              ($"w_n" * $"cents" - $"w_sum")
                * ($"w_n" * $"cents" - $"w_sum")
              > lit(4L) * ($"w_n" * $"w_sumsq" - $"w_sum" * $"w_sum"))
          .drop("ts")
      },
      Some("""WITH v AS (
             |  SELECT user_id, event_id, ts,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events
             |), f AS (
             |  SELECT user_id, event_id, cents,
             |    CAST(count(*) OVER w AS BIGINT) AS w_n,
             |    CAST(coalesce(sum(cents) OVER w, 0) AS BIGINT) AS w_sum,
             |    CAST(coalesce(sum(cents * cents) OVER w, 0) AS BIGINT)
             |      AS w_sumsq
             |  FROM v
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
             |)
             |SELECT user_id, event_id, cents, w_n, w_sum, w_sumsq,
             |  w_n >= 4 AND
             |    (w_n * cents - w_sum) * (w_n * cents - w_sum)
             |      > 4 * (w_n * w_sumsq - w_sum * w_sum) AS is_anomaly
             |FROM f""".stripMargin),
    ),

    // ---- multi-touch attribution: every purchase splits 1000 milli
    // of credit EVENLY (integer div; the remainder stays unassigned —
    // documented, not silently dropped) across the user's view/click
    // touches in the preceding 30 minutes. The join is equi on user
    // plus a time-range predicate — sort-merge on the user key with
    // the range as residual, bounded by per-user activity; at
    // pathological per-user volumes the binned
    // [[graft.ops.TemporalJoins.rangeJoin]] shape applies. Exact
    // integers end to end.
    Q(
      "q238_attribution",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_id", $"event_type",
            $"ts".cast("long").as("sec"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id".as("purchase_id"),
            $"sec".as("p_sec"))
        val touches = ev
          .filter($"event_type" === "view" || $"event_type" === "click")
          .select($"user_id", $"event_id".as("touch_id"),
            $"event_type".as("touch_type"), $"sec".as("t_sec"))
        val joined = purchases.join(touches, Seq("user_id"))
          .filter($"t_sec" >= $"p_sec" - 1800 && $"t_sec" < $"p_sec")
        val n = Window.partitionBy($"purchase_id")
        joined
          .withColumn("n_touches", count(lit(1)).over(n))
          .withColumn("credit_milli", expr("1000L div n_touches"))
          .select($"user_id", $"purchase_id", $"touch_id",
            $"touch_type", $"n_touches", $"credit_milli")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
             |  FROM events
             |), p AS (
             |  SELECT user_id, event_id AS purchase_id, sec AS p_sec
             |  FROM e WHERE event_type = 'purchase'
             |), t AS (
             |  SELECT user_id, event_id AS touch_id,
             |    event_type AS touch_type, sec AS t_sec
             |  FROM e WHERE event_type IN ('view', 'click')
             |), j AS (
             |  SELECT p.user_id, purchase_id, touch_id, touch_type,
             |    CAST(count(*) OVER (PARTITION BY purchase_id)
             |      AS BIGINT) AS n_touches
             |  FROM p JOIN t ON p.user_id = t.user_id
             |   AND t.t_sec >= p.p_sec - 1800 AND t.t_sec < p.p_sec
             |)
             |SELECT user_id, purchase_id, touch_id, touch_type,
             |  n_touches, 1000 // n_touches AS credit_milli
             |FROM j""".stripMargin),
    ),

    // ---- hourly gap filling (TemporalJoins.fillHourlyGaps): each
    // user's sparse event history densifies into a contiguous hour
    // grid with zero-filled silent hours — the resample rows every
    // rolling baseline needs to exist. Grid rows are born distributed
    // via a codegen'd sequence explode on the per-key bounds; a
    // span-guard assert_true lives inside the sequence bound so
    // column pruning can't drop it.
    Q(
      "q240_gap_fill",
      (s, d) => {
        import s.implicits._
        graft.ops.TemporalJoins.fillHourlyGaps(
          Tables.events(s, d).select($"user_id", $"ts",
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents")),
          "user_id", "ts", "cents")
      },
      Some("""WITH v AS (
             |  SELECT user_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events
             |), bounds AS (
             |  SELECT user_id, min(h) AS h0, max(h) AS h1
             |  FROM v GROUP BY 1
             |), grid AS (
             |  SELECT user_id, unnest(range(h0, h1 + 1)) AS hour
             |  FROM bounds
             |), obs AS (
             |  SELECT user_id, h AS hour, count(*) AS n_events,
             |    CAST(sum(cents) AS BIGINT) AS sum_val
             |  FROM v GROUP BY 1, 2
             |)
             |SELECT g.user_id, g.hour,
             |  coalesce(o.n_events, 0) AS n_events,
             |  coalesce(o.sum_val, 0) AS sum_val
             |FROM grid g LEFT JOIN obs o
             |  ON o.user_id = g.user_id AND o.hour = g.hour"""
        .stripMargin),
    ),

    // ---- k-core peel at k=100 over the co-purchase graph (GraphOps
    // .kCorePeel): four explicit peel rounds drop every part whose
    // surviving co-purchase degree is under 100, cascading — the
    // density filter that separates genuinely well-connected nodes
    // from ones propped up by since-peeled neighbors. The `converged`
    // flag is part of the output contract (round-3 vs round-4 survivor
    // counts), so a bounded peel can never silently pose as the exact
    // core. The oracle replays all four rounds as chained CTEs.
    Q(
      "q241_kcore",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_partkey")
        val edges = li.as("x").join(li.as("y"),
            $"x.l_orderkey" === $"y.l_orderkey"
              && $"x.l_partkey" < $"y.l_partkey")
          .select($"x.l_partkey".as("src"), $"y.l_partkey".as("dst"))
        graft.ops.GraphOps.kCorePeel(edges, k = 100, rounds = 4)
      },
      Some("""WITH e0 AS MATERIALIZED (
             |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
             |  FROM lineitem x JOIN lineitem y
             |    ON x.l_orderkey = y.l_orderkey
             |   AND x.l_partkey < y.l_partkey
             |), n0 AS (
             |  SELECT a AS node FROM e0 UNION SELECT b FROM e0
             |), s1 AS MATERIALIZED (
             |  SELECT node FROM (
             |    SELECT node, count(*) AS d FROM (
             |      SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0
             |    ) GROUP BY 1) WHERE d >= 100
             |), e1 AS MATERIALIZED (
             |  SELECT a, b FROM e0
             |  WHERE a IN (SELECT node FROM s1)
             |    AND b IN (SELECT node FROM s1)
             |), s2 AS (
             |  SELECT node FROM (
             |    SELECT node, count(*) AS d FROM (
             |      SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1
             |    ) GROUP BY 1) WHERE d >= 100
             |), e2 AS MATERIALIZED (
             |  SELECT a, b FROM e1
             |  WHERE a IN (SELECT node FROM s2)
             |    AND b IN (SELECT node FROM s2)
             |), s3 AS (
             |  SELECT node FROM (
             |    SELECT node, count(*) AS d FROM (
             |      SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2
             |    ) GROUP BY 1) WHERE d >= 100
             |), e3 AS MATERIALIZED (
             |  SELECT a, b FROM e2
             |  WHERE a IN (SELECT node FROM s3)
             |    AND b IN (SELECT node FROM s3)
             |), s4 AS (
             |  SELECT node FROM (
             |    SELECT node, count(*) AS d FROM (
             |      SELECT a AS node FROM e3 UNION ALL SELECT b FROM e3
             |    ) GROUP BY 1) WHERE d >= 100
             |)
             |SELECT n0.node,
             |  n0.node IN (SELECT node FROM s4) AS in_core,
             |  (SELECT count(*) FROM s3) = (SELECT count(*) FROM s4)
             |    AS converged
             |FROM n0""".stripMargin),
    ),

    // ---- RFM segmentation: each user's recency / frequency /
    // monetary metric lands in its equi-depth quintile via three
    // passes of the distributed NTILE (SketchStats.globalNtile — the
    // two-pass ranked scan, never `ntile() OVER (ORDER BY …)`'s
    // single-partition window). Tile 1 = best (most recent / most
    // active / highest spend); ties pinned by user_id. The oracle runs
    // DuckDB's real ntile() three times — equality proves each
    // distributed pass replays SQL NTILE exactly, composed.
    Q(
      "q242_rfm_segments",
      (s, d) => {
        import s.implicits._
        val m = Tables.events(s, d)
          .select($"user_id", $"ts".cast("long").as("sec"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents"))
          .groupBy($"user_id")
          .agg(max($"sec").as("recency_sec"),
            count(lit(1)).as("frequency"),
            sum($"cents").as("monetary_cents"))
        val withR = graft.ops.SketchStats.globalNtile(m,
          Seq($"recency_sec".desc, $"user_id".asc), 5, "r_tile")
        val withF = graft.ops.SketchStats.globalNtile(withR,
          Seq($"frequency".desc, $"user_id".asc), 5, "f_tile")
        val withM = graft.ops.SketchStats.globalNtile(withF,
          Seq($"monetary_cents".desc, $"user_id".asc), 5, "m_tile")
        withM.withColumn("rfm_code",
          ($"r_tile" * 100 + $"f_tile" * 10 + $"m_tile").cast("int"))
      },
      Some("""WITH m AS (
             |  SELECT user_id,
             |    max(CAST(floor(epoch(ts)) AS BIGINT)) AS recency_sec,
             |    count(*) AS frequency,
             |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
             |      AS BIGINT)) AS BIGINT) AS monetary_cents
             |  FROM events GROUP BY 1
             |)
             |SELECT user_id, recency_sec, frequency, monetary_cents,
             |  CAST(ntile(5) OVER (ORDER BY recency_sec DESC, user_id)
             |    AS INT) AS r_tile,
             |  CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id)
             |    AS INT) AS f_tile,
             |  CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, user_id)
             |    AS INT) AS m_tile,
             |  r_tile * 100 + f_tile * 10 + m_tile AS rfm_code
             |FROM m""".stripMargin),
    ),

    // ---- Fellegi–Sunter record linkage (EntityResolution.linkage):
    // customers link to suppliers within a NATION block (pairs exist
    // only inside equal block keys — one equi-join, never n×m), each
    // pair scored by an integer milli log-odds agreement vector over
    // three field comparators. Weights are inputs (fit offline via
    // EM); the per-pair score is an associative integer sum. The
    // fixture fields are synthetic, so the comparators derive
    // deterministic features both engines restate (balance bucket,
    // name-suffix residue, address-length parity).
    Q(
      "q243_record_linkage",
      (s, d) => {
        import s.implicits._
        import graft.ops.EntityResolution.{Comparator, linkage}
        // abs() before the bucket div: acctbal can be negative, and
        // Spark `div` truncates where DuckDB `//` floors — on the
        // non-negative magnitude the two agree (q205's convention)
        val cust = Tables.customer(s, d).select(
          $"c_custkey", $"c_nationkey",
          expr("abs(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100"
            + " AS BIGINT)) div 100000").as("c_bal_bucket"),
          expr("CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)"
            + " % 97").as("c_suffix"),
          expr("CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)"
            + " % 2").as("c_addr_parity"))
        val supp = Tables.supplier(s, d).select(
          $"s_suppkey", $"s_nationkey",
          expr("abs(CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100"
            + " AS BIGINT)) div 100000").as("s_bal_bucket"),
          expr("CAST(regexp_extract(s_name, '([0-9]+)$', 1) AS BIGINT)"
            + " % 97").as("s_suffix"),
          expr("CAST(regexp_extract(s_name, '([0-9]+)$', 1) AS BIGINT)"
            + " % 2").as("s_addr_parity"))
        linkage(
          cust.withColumnRenamed("c_nationkey", "nation"),
          supp.withColumnRenamed("s_nationkey", "nation"),
          blockCol = "nation",
          leftIdCol = "c_custkey", rightIdCol = "s_suppkey",
          comparators = Seq(
            Comparator("bal", (a, b) => a === b,
              "c_bal_bucket", "s_bal_bucket", 2400L, -300L),
            Comparator("suffix", (a, b) => a === b,
              "c_suffix", "s_suffix", 3600L, -200L),
            Comparator("parity", (a, b) => a === b,
              "c_addr_parity", "s_addr_parity", 700L, -700L)),
          thresholdMilli = 3000L)
      },
      Some("""WITH c AS (
             |  SELECT c_custkey AS left_id, c_nationkey AS block,
             |    abs(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
             |      AS BIGINT)) // 100000 AS bal,
             |    CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)
             |      % 97 AS suffix,
             |    CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)
             |      % 2 AS parity
             |  FROM customer
             |), su AS (
             |  SELECT s_suppkey AS right_id, s_nationkey AS block,
             |    abs(CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100
             |      AS BIGINT)) // 100000 AS bal,
             |    CAST(regexp_extract(s_name, '([0-9]+)$', 1) AS BIGINT)
             |      % 97 AS suffix,
             |    CAST(regexp_extract(s_name, '([0-9]+)$', 1) AS BIGINT)
             |      % 2 AS parity
             |  FROM supplier
             |), p AS (
             |  SELECT c.left_id, su.right_id, c.block,
             |    c.bal = su.bal AS agree_bal,
             |    c.suffix = su.suffix AS agree_suffix,
             |    c.parity = su.parity AS agree_parity
             |  FROM c JOIN su ON c.block = su.block
             |)
             |SELECT left_id, right_id, block,
             |  agree_bal, agree_suffix, agree_parity,
             |  CAST((CASE WHEN agree_bal THEN 2400 ELSE -300 END)
             |    + (CASE WHEN agree_suffix THEN 3600 ELSE -200 END)
             |    + (CASE WHEN agree_parity THEN 700 ELSE -700 END)
             |    AS BIGINT) AS score_milli
             |FROM p
             |WHERE (CASE WHEN agree_bal THEN 2400 ELSE -300 END)
             |    + (CASE WHEN agree_suffix THEN 3600 ELSE -200 END)
             |    + (CASE WHEN agree_parity THEN 700 ELSE -700 END)
             |  >= 3000""".stripMargin),
    ),

    // ---- linear interpolation over the q240 grid (TemporalJoins
    // .interpolateLinear): silent hours get the integer-exact straight
    // line between their nearest observed neighbors — two ignore-nulls
    // windows per user, the sign-guarded division for falling
    // segments. The gap-fill zeros become honest estimates; observed
    // rows pass through untouched.
    Q(
      "q246_interpolate",
      (s, d) => {
        import s.implicits._
        val grid = graft.ops.TemporalJoins.fillHourlyGaps(
          Tables.events(s, d).select($"user_id", $"ts",
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents")),
          "user_id", "ts", "cents")
        graft.ops.TemporalJoins.interpolateLinear(grid,
          "user_id", "hour", "sum_val", "n_events")
      },
      Some("""WITH v AS (
             |  SELECT user_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events
             |), bounds AS (
             |  SELECT user_id, min(h) AS h0, max(h) AS h1
             |  FROM v GROUP BY 1
             |), grid AS (
             |  SELECT user_id, unnest(range(h0, h1 + 1)) AS hour
             |  FROM bounds
             |), obs AS (
             |  SELECT user_id, h AS hour, count(*) AS n_events,
             |    CAST(sum(cents) AS BIGINT) AS sum_val
             |  FROM v GROUP BY 1, 2
             |), g AS (
             |  SELECT gr.user_id, gr.hour,
             |    coalesce(o.n_events, 0) AS n_events,
             |    coalesce(o.sum_val, 0) AS sum_val,
             |    CASE WHEN o.n_events > 0 THEN o.sum_val END AS ov,
             |    CASE WHEN o.n_events > 0 THEN gr.hour END AS oh
             |  FROM grid gr LEFT JOIN obs o
             |    ON o.user_id = gr.user_id AND o.hour = gr.hour
             |), w AS (
             |  SELECT user_id, hour, n_events, sum_val,
             |    last_value(ov IGNORE NULLS) OVER wp AS pv,
             |    last_value(oh IGNORE NULLS) OVER wp AS ph,
             |    first_value(ov IGNORE NULLS) OVER wn AS nv,
             |    first_value(oh IGNORE NULLS) OVER wn AS nh
             |  FROM g
             |  WINDOW wp AS (PARTITION BY user_id ORDER BY hour
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  wn AS (PARTITION BY user_id ORDER BY hour
             |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             |)
             |SELECT user_id, hour, n_events, sum_val,
             |  CASE WHEN n_events > 0 THEN sum_val
             |    ELSE pv + CASE
             |      WHEN (nv - pv) * (hour - ph) >= 0
             |        THEN ((nv - pv) * (hour - ph)) // (nh - ph)
             |      ELSE -((-((nv - pv) * (hour - ph))) // (nh - ph))
             |    END
             |  END AS interp_val
             |FROM w""".stripMargin),
    ),

    // ---- data-contract report (Expectations.validate): the orders
    // table publishes its own quality gate — null checks, a cents
    // range, a status-domain regex, key uniqueness, and referential
    // integrity against customer. Row-local rules fold into ONE
    // conditional-aggregation scan; uniqueness pays one group-by,
    // the FK one broadcast anti-join. The fixture is clean, so every
    // rule passes with 0 violations — the point the oracle pins is
    // that both engines COUNT the same way, not that the data is
    // dirty (violation arithmetic is covered by the spec's planted
    // dirty frame).
    Q(
      "q248_data_contract",
      (s, d) => {
        import graft.ops.Expectations._
        val orders = Tables.orders(s, d).withColumn("price_cents",
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
            + " AS BIGINT)"))
        validate(orders, Seq(
          NotNull("o_custkey"),
          InRange("price_cents", 0L, 100000000L),
          Matches("o_orderstatus", "[FOP]"),
          Unique(Seq("o_orderkey")),
          ForeignKey("o_custkey", Tables.customer(s, d), "c_custkey")))
      },
      Some("""WITH o AS (
             |  SELECT *, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
             |    AS BIGINT) AS price_cents
             |  FROM orders
             |), n AS (SELECT count(*) AS n_rows FROM o),
             |v AS (
             |  SELECT 'not_null:o_custkey' AS rule,
             |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0
             |      END) AS BIGINT) AS n_violations
             |  FROM o
             |  UNION ALL
             |  SELECT 'in_range:price_cents',
             |    CAST(sum(CASE WHEN price_cents IS NULL
             |      OR price_cents < 0 OR price_cents > 100000000
             |      THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM o
             |  UNION ALL
             |  SELECT 'matches:o_orderstatus',
             |    CAST(sum(CASE WHEN o_orderstatus IS NULL
             |      OR NOT regexp_full_match(o_orderstatus, '(?:[FOP])')
             |      THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM o
             |  UNION ALL
             |  SELECT 'unique:o_orderkey',
             |    CAST(coalesce((SELECT sum(c) FROM (
             |      SELECT count(*) AS c FROM o GROUP BY o_orderkey
             |      HAVING count(*) > 1)), 0) AS BIGINT)
             |  UNION ALL
             |  SELECT 'foreign_key:o_custkey',
             |    CAST((SELECT count(*) FROM o
             |      WHERE o_custkey IS NOT NULL
             |        AND o_custkey NOT IN
             |          (SELECT c_custkey FROM customer)) AS BIGINT)
             |)
             |SELECT v.rule, n.n_rows, v.n_violations,
             |  v.n_violations = 0 AS pass
             |FROM v CROSS JOIN n""".stripMargin),
    ),

    // ---- per-user feature extraction (the feature-store row): one
    // pass over events builds the classic activity features — totals,
    // a trailing-7-day count anchored on the corpus max timestamp
    // (deterministic, no wall clock), active-day count, mean
    // inter-event gap (integer div over the span), and the modal
    // event type via ONE struct-max (count desc, type asc ties) — no
    // window, no second scan; the per-user aggregation is map-side
    // combined.
    Q(
      "q249_user_features",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_type", $"ts".cast("long").as("sec"),
            expr("CAST(ts AS LONG) div 86400").as("day"))
        val anchor = ev.agg(max($"sec").as("__mx"))
        // modal type via ONE struct-max — count ties break to the
        // lexicographically largest type (struct ordering); the
        // oracle restates the same rule with a rank window
        val byType = ev.groupBy($"user_id", $"event_type")
          .agg(count(lit(1)).as("__c"))
          .groupBy($"user_id")
          .agg(max(struct($"__c".as("c"), $"event_type".as("t")))
            .as("__m"))
          .select($"user_id", $"__m.t".as("top_type_raw"),
            $"__m.c".as("top_type_n"))
        ev.crossJoin(broadcast(anchor))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(when($"sec" >= $"__mx" - 7L * 86400L, 1L).otherwise(0L))
              .as("n_events_7d"),
            countDistinct($"day").as("n_active_days"),
            min($"sec").as("first_sec"), max($"sec").as("last_sec"))
          .withColumn("mean_gap_sec",
            when($"n_events" > 1,
              expr("(last_sec - first_sec) div (n_events - 1)"))
              .otherwise(lit(0L)))
          .join(byType, "user_id")
          .select($"user_id", $"n_events", $"n_events_7d",
            $"n_active_days", $"mean_gap_sec",
            $"top_type_raw".as("top_type"), $"top_type_n")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
             |  FROM events
             |), mx AS (SELECT max(sec) AS m FROM e),
             |tt AS (
             |  SELECT user_id, event_type AS top_type,
             |    CAST(c AS BIGINT) AS top_type_n
             |  FROM (
             |    SELECT user_id, event_type, count(*) AS c,
             |      row_number() OVER (PARTITION BY user_id
             |        ORDER BY count(*) DESC, event_type DESC) AS rn
             |    FROM e GROUP BY 1, 2
             |  ) WHERE rn = 1
             |)
             |SELECT e.user_id, count(*) AS n_events,
             |  CAST(sum(CASE WHEN sec >= (SELECT m FROM mx) - 7 * 86400
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_events_7d,
             |  count(DISTINCT day) AS n_active_days,
             |  CASE WHEN count(*) > 1
             |    THEN (max(sec) - min(sec)) // (count(*) - 1)
             |    ELSE 0 END AS mean_gap_sec,
             |  any_value(tt.top_type) AS top_type,
             |  any_value(tt.top_type_n) AS top_type_n
             |FROM e JOIN tt ON tt.user_id = e.user_id
             |GROUP BY 1""".stripMargin),
    ),

    // ---- table profile (ANALYZE-style column statistics): one
    // conditional-aggregation SCAN computes every column's null count
    // plus min/max rendered to strings, and one multi-column
    // count-distinct pass the exact cardinalities — the catalog stats
    // a cost-based planner (or a data-quality dashboard) reads.
    // Numeric/timestamp renderings are pinned (cents, yyyy-MM-dd
    // HH:mm:ss) so both engines print identical strings. At 100 TB
    // swap the exact distinct pass for approx_count_distinct behind
    // the q69 sketch-gate pattern; the scan pass is already one job.
    Q(
      "q250_table_profile",
      (s, d) => {
        import s.implicits._
        // widened: five exact count-distincts expand the input 5× and
        // a one-file table would push all of it through ONE task (the
        // r12 narrow-scan finding); the 3 MB exchange is free next to
        // the serial expand
        val o = graft.ops.Materialize.widened(Tables.orders(s, d))
          .withColumn("price_cents",
            expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
              + " AS BIGINT)"))
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "price_cents", "o_orderpriority")
        def render(c: String) = col(c).cast("string")
        val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
            min(render(c)).as(s"__min_$c"),
            max(render(c)).as(s"__max_$c"),
            countDistinct(col(c)).as(s"__nd_$c"))
        }
        val r = o.agg(aggs.head, aggs.tail: _*).head()
        val nRows = r.getLong(0)
        cols.map { c =>
          (c, nRows, r.getAs[Long](s"__null_$c"),
            r.getAs[Long](s"__nd_$c"),
            r.getAs[String](s"__min_$c"), r.getAs[String](s"__max_$c"))
        }.toDF("column_name", "n_rows", "n_null", "n_distinct",
          "min_str", "max_str")
      },
      Some("""WITH o AS (
             |  SELECT *, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
             |    AS BIGINT) AS price_cents
             |  FROM orders
             |)
             |SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
             |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_null,
             |  count(DISTINCT o_orderkey) AS n_distinct,
             |  CAST(min(CAST(o_orderkey AS VARCHAR)) AS VARCHAR)
             |    AS min_str,
             |  CAST(max(CAST(o_orderkey AS VARCHAR)) AS VARCHAR)
             |    AS max_str
             |FROM o
             |UNION ALL
             |SELECT 'o_custkey', count(*),
             |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT),
             |  count(DISTINCT o_custkey),
             |  min(CAST(o_custkey AS VARCHAR)),
             |  max(CAST(o_custkey AS VARCHAR))
             |FROM o
             |UNION ALL
             |SELECT 'o_orderstatus', count(*),
             |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0
             |    END) AS BIGINT),
             |  count(DISTINCT o_orderstatus),
             |  min(o_orderstatus), max(o_orderstatus)
             |FROM o
             |UNION ALL
             |SELECT 'price_cents', count(*),
             |  CAST(sum(CASE WHEN price_cents IS NULL THEN 1 ELSE 0
             |    END) AS BIGINT),
             |  count(DISTINCT price_cents),
             |  min(CAST(price_cents AS VARCHAR)),
             |  max(CAST(price_cents AS VARCHAR))
             |FROM o
             |UNION ALL
             |SELECT 'o_orderpriority', count(*),
             |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0
             |    END) AS BIGINT),
             |  count(DISTINCT o_orderpriority),
             |  min(o_orderpriority), max(o_orderpriority)
             |FROM o""".stripMargin),
    ),

    // ---- period-over-period report: weekly revenue per market
    // segment with the week-over-week change in basis points. The lag
    // window runs over the AGGREGATED (segment, week) frame —
    // |segments|·|weeks| rows, never the fact table — so the
    // "dashboard window" costs nothing at any fact scale; the change
    // division is sign-guarded (q205) since a revenue DROP makes the
    // numerator negative. First weeks and zero-base weeks report a
    // null change rather than a fake 0 — absence of a comparison is
    // not a 0% change.
    Q(
      "q252_period_over_period",
      (s, d) => {
        import s.implicits._
        val weekly = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)),
            $"o_custkey" === $"c_custkey")
          .groupBy($"c_mktsegment",
            // o_orderdate is TIMESTAMP_NTZ off the scan; the NTZ →
            // TIMESTAMP hop is value-preserving under the session's
            // required UTC (Tables.scala:32)
            expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG)"
              + " div 604800").as("week"))
          .agg(sum(expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .as("revenue_cents"))
        val w = Window.partitionBy($"c_mktsegment").orderBy($"week".asc)
        weekly
          .withColumn("prev_revenue_cents", lag($"revenue_cents", 1).over(w))
          .withColumn("change_bps",
            when($"prev_revenue_cents".isNull
              || $"prev_revenue_cents" === 0L, lit(null))
              .otherwise(expr(
                """CASE WHEN (revenue_cents - prev_revenue_cents) >= 0
                  | THEN ((revenue_cents - prev_revenue_cents) * 10000)
                  |   div abs(prev_revenue_cents)
                  | ELSE -((-(revenue_cents - prev_revenue_cents)
                  |   * 10000) div abs(prev_revenue_cents))
                  |END""".stripMargin)))
      },
      Some("""WITH weekly AS (
             |  SELECT c_mktsegment,
             |    CAST(floor(epoch(o_orderdate)) AS BIGINT) // 604800
             |      AS week,
             |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))
             |      * 100 AS BIGINT)) AS BIGINT) AS revenue_cents
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2
             |)
             |SELECT c_mktsegment, week, revenue_cents,
             |  lag(revenue_cents, 1) OVER w AS prev_revenue_cents,
             |  CASE WHEN lag(revenue_cents, 1) OVER w IS NULL
             |      OR lag(revenue_cents, 1) OVER w = 0 THEN NULL
             |    WHEN (revenue_cents - lag(revenue_cents, 1) OVER w)
             |      >= 0
             |    THEN ((revenue_cents - lag(revenue_cents, 1) OVER w)
             |      * 10000) // abs(lag(revenue_cents, 1) OVER w)
             |    ELSE -((-((revenue_cents
             |      - lag(revenue_cents, 1) OVER w)) * 10000)
             |      // abs(lag(revenue_cents, 1) OVER w))
             |  END AS change_bps
             |FROM weekly
             |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY week)"""
        .stripMargin),
    ),
  )
}
