package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.JaroWinkler
import graft.model.Tables
import graft.ops.{Association, Behavior, Dedup, GeoOps, GraphOps, Incremental, RankStats, Sampling, Scoring, SeriesStats, SketchStats, Skyline, Survival, TemporalJoins}

/** Round-8 analytics wave: association rules, survival analysis,
  * inference statistics, spatial self-join, sliding distinct counts.
  * Each query pairs a Spark-first distributed shape with a DuckDB
  * restatement; doubles follow the exact-sufficient-statistics
  * discipline (see [[graft.ops.SeriesStats]]) so hashes are stable.
  */
object AnalyticsQueries extends QueryModule {

  val queries: Seq[Q] = Seq(

    // ---- market-basket association rules (Apriori 2-itemset pass as
    // relational algebra — ops/Association.scala): pair counts from a
    // basket-key self-join (fan-out bounded by basket size, never n²),
    // support/confidence/lift as single IEEE divisions over exact
    // counts. DuckDB restates the same joins.
    Q(
      "q253_market_basket",
      (s, d) => Association.pairRules(
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minPairCount = 2L),
      Some("""WITH it AS (
             |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
             |  FROM lineitem
             |), nb AS (
             |  SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
             |  FROM it
             |), ic AS (
             |  SELECT item, CAST(count(*) AS BIGINT) AS c_item
             |  FROM it GROUP BY 1
             |), p AS (
             |  SELECT a.item AS item1, b.item AS item2,
             |    CAST(count(*) AS BIGINT) AS c_pair
             |  FROM it a JOIN it b
             |    ON a.basket = b.basket AND a.item < b.item
             |  GROUP BY 1, 2 HAVING count(*) >= 2
             |)
             |SELECT item1, item2, n_baskets, c_pair,
             |  c1.c_item AS c_item1, c2.c_item AS c_item2,
             |  CAST(c_pair AS DOUBLE) / n_baskets AS support,
             |  CAST(c_pair AS DOUBLE) / c1.c_item AS conf_1_to_2,
             |  CAST(c_pair AS DOUBLE) / c2.c_item AS conf_2_to_1,
             |  CAST(c_pair AS DOUBLE) * n_baskets
             |    / (c1.c_item * c2.c_item) AS lift
             |FROM p JOIN ic c1 ON p.item1 = c1.item
             |       JOIN ic c2 ON p.item2 = c2.item, nb"""
        .stripMargin),
    ),

    // ---- Kaplan–Meier survival curve (ops/Survival.scala): order
    // "lifetime" = days from order to last shipment, observed when the
    // order is fulfilled ('F'), right-censored otherwise. The subject
    // table reduces to the tiny timepoint axis before any serial work;
    // the survival product is a PINNED-ORDER serial fold (see module
    // scaladoc — DuckDB's windowed product() would diverge), restated
    // by the oracle with list_reduce over the t-ordered factor list.
    Q(
      "q254_kaplan_meier",
      (s, d) => {
        import s.implicits._
        // NOT width-pinned (r14, measured): the AQE-coalesced 1-task
        // join stage looked like the q241 trap, but pinning the
        // aggregation/join width with an explicit repartition
        // REGRESSED it 1.31 -> 1.88 s idle min-of-3 — the coalesced
        // serial stage is only ~0.9 s under ambient load and the pin
        // pays an extra exchange plus 32-task fixed costs every rep
        val lastShip = Tables.lineitem(s, d)
          .groupBy($"l_orderkey")
          .agg(max($"l_shipdate").as("last_ship"))
        val dur = Tables.orders(s, d)
          .join(lastShip, $"o_orderkey" === $"l_orderkey")
          .select(
            datediff(to_date($"last_ship"), to_date($"o_orderdate"))
              .as("t"),
            ($"o_orderstatus" === "F").cast("int").as("ev"))
        Survival.kaplanMeier(dur, "t", "ev")
      },
      Some("""WITH dur AS (
             |  SELECT o.o_orderkey,
             |    date_diff('day', CAST(o.o_orderdate AS DATE),
             |      CAST(max(l.l_shipdate) AS DATE)) AS t,
             |    CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
             |  FROM orders o JOIN lineitem l
             |    ON l.l_orderkey = o.o_orderkey
             |  GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus
             |), per AS (
             |  SELECT t, count(*) AS c_all, sum(ev) AS d
             |  FROM dur GROUP BY 1
             |), risk AS (
             |  SELECT CAST(t AS BIGINT) AS t,
             |    CAST(d AS BIGINT) AS d_events,
             |    CAST(sum(c_all) OVER (ORDER BY t DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS n_risk
             |  FROM per
             |), fac AS (
             |  SELECT t, n_risk, d_events,
             |    CAST(n_risk - d_events AS DOUBLE) / n_risk AS f
             |  FROM risk WHERE d_events > 0
             |)
             |SELECT a.t, a.n_risk, a.d_events,
             |  CAST(a.d_events AS DOUBLE) / a.n_risk AS hazard,
             |  (SELECT list_reduce(list(b.f ORDER BY b.t),
             |     (x, y) -> x * y)
             |   FROM fac b WHERE b.t <= a.t) AS survival
             |FROM fac a""".stripMargin),
    ),

    // ---- Welch's two-sample t-test per event type (A/B sides =
    // user-id parity): six exact per-side sums through ONE hash
    // aggregation, then t and the Welch–Satterthwaite dof as fixed-
    // shape formulas whose SQL text is SHARED verbatim between the
    // Spark plan and this oracle (op order, hence every ulp, pinned).
    Q(
      "q255_welch_ttest",
      (s, d) => SeriesStats.welchTTest(
        Tables.events(s, d)
          .select(col("event_type"),
            (col("user_id") % 2 === 1).as("side_b"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents")),
        "event_type", "side_b", "cents"),
      Some(s"""WITH v AS (
              |  SELECT event_type, user_id % 2 = 1 AS b,
              |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              |      AS x
              |  FROM events
              |), a AS (
              |  SELECT event_type,
              |    CAST(count(*) FILTER (WHERE NOT b) AS BIGINT) AS n_a,
              |    CAST(coalesce(sum(x) FILTER (WHERE NOT b), 0)
              |      AS BIGINT) AS s_a,
              |    CAST(coalesce(sum(x * x) FILTER (WHERE NOT b), 0)
              |      AS BIGINT) AS q_a,
              |    CAST(count(*) FILTER (WHERE b) AS BIGINT) AS n_b,
              |    CAST(coalesce(sum(x) FILTER (WHERE b), 0)
              |      AS BIGINT) AS s_b,
              |    CAST(coalesce(sum(x * x) FILTER (WHERE b), 0)
              |      AS BIGINT) AS q_b
              |  FROM v GROUP BY 1
              |), f AS (
              |  SELECT *,
              |    ${SeriesStats.MeanSql("s_a", "n_a")} AS mean_a,
              |    ${SeriesStats.MeanSql("s_b", "n_b")} AS mean_b,
              |    ${SeriesStats.VarSql("s_a", "q_a", "n_a")} AS var_a,
              |    ${SeriesStats.VarSql("s_b", "q_b", "n_b")} AS var_b
              |  FROM a WHERE n_a >= 2 AND n_b >= 2
              |), g AS (
              |  SELECT *, var_a / n_a + var_b / n_b AS se2 FROM f
              |)
              |SELECT event_type, n_a, n_b, mean_a, mean_b, var_a,
              |  var_b,
              |  (mean_a - mean_b) / sqrt(se2) AS t_stat,
              |  se2 * se2 / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
              |    + (var_b / n_b) * (var_b / n_b) / (n_b - 1)) AS dof
              |FROM g""".stripMargin),
    ),

    // ---- Benford first-digit audit of order totals: digits from the
    // decimal string of exact cents (no float formatting), Benford
    // expectations as shortest-round-trip literals shared with the
    // oracle, chi-square terms per digit (no cross-row double sum).
    Q(
      "q256_benford_audit",
      (s, d) => SeriesStats.benfordAudit(Tables.orders(s, d),
        "o_totalprice"),
      Some {
        val values = SeriesStats.BenfordP
          .map { case (dg, p) => s"($dg, $p)" }.mkString(", ")
        s"""WITH c AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |    AS BIGINT) AS cents
           |  FROM orders
           |), dig AS (
           |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT)
           |      AS digit,
           |    CAST(count(*) AS BIGINT) AS n_obs
           |  FROM c WHERE cents > 0 GROUP BY 1
           |), tot AS (
           |  SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM dig
           |), exp AS (
           |  SELECT digit, CAST(p_benford AS DOUBLE) AS p_benford
           |  FROM (VALUES $values) e(digit, p_benford)
           |), j AS (
           |  SELECT e.digit, e.p_benford,
           |    CAST(coalesce(g.n_obs, 0) AS BIGINT) AS n_obs, t.n_total
           |  FROM exp e LEFT JOIN dig g ON e.digit = g.digit, tot t
           |)
           |SELECT digit, n_obs, n_total,
           |  CAST(n_obs AS DOUBLE) / n_total AS frac_obs, p_benford,
           |  (n_obs - n_total * p_benford)
           |    * (n_obs - n_total * p_benford)
           |    / (n_total * p_benford) AS chisq_term
           |FROM j""".stripMargin
      },
    ),

    // ---- grid-cell spatial self-join (ops/GeoOps.scala): all user
    // pairs within planar distance 60 on a deterministic synthetic
    // coordinate field (md5-mixed, NOT a linear map — a·u mod m puts
    // points on a sparse lattice whose minimum pair distance exceeds
    // any useful radius). Spark buckets into r-cells and equi-joins
    // the 3×3 neighborhood (linear in points for bounded density);
    // the oracle brute-forces the n² predicate — same exact-int d².
    Q(
      "q257_grid_distance_join",
      (s, d) => GeoOps.radiusPairs(
        Tables.events(s, d).select(col("user_id")).distinct()
          .select(col("user_id").as("id"),
            (conv(substring(md5(concat(col("user_id").cast("string"),
              lit("gx"))), 1, 6), 16, 10).cast("long") % 1500).as("x"),
            (conv(substring(md5(concat(col("user_id").cast("string"),
              lit("gy"))), 1, 6), 16, 10).cast("long") % 1500).as("y")),
        "id", "x", "y", r = 60L),
      Some("""WITH u AS (
             |  SELECT DISTINCT user_id FROM events
             |), p AS (
             |  SELECT user_id AS id,
             |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)
             |      || 'gx'), 1, 6) AS BIGINT) % 1500 AS x,
             |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)
             |      || 'gy'), 1, 6) AS BIGINT) % 1500 AS y
             |  FROM u
             |)
             |SELECT a.id AS id1, b.id AS id2, a.x AS x1, a.y AS y1,
             |  b.x AS x2, b.y AS y2,
             |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             |    AS d2
             |FROM p a JOIN p b ON a.id < b.id
             |WHERE (a.x - b.x) * (a.x - b.x)
             |  + (a.y - b.y) * (a.y - b.y) <= 3600""".stripMargin),
    ),

    // ---- autocorrelation of the daily-revenue series at lags 1..7
    // (ops/SeriesStats.autocorrelation): the 100-TB fact table reduces
    // to the tiny day axis by ONE exact hash aggregation (whole-dollar
    // BIGINT, so every Σ including cross-products stays exact); all
    // lags share a single self-equi-join on the axis; each acf is one
    // fixed-shape IEEE formula. DuckDB restates axis, join, formula.
    Q(
      "q259_acf",
      (s, d) => SeriesStats.autocorrelation(
        Tables.lineitem(s, d)
          .groupBy(datediff(to_date(col("l_shipdate")),
            lit("1970-01-01")).as("day"))
          .agg(expr("sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))" +
            " * 100 AS BIGINT)) div 100").as("dollars")),
        "day", "dollars", maxLag = 7),
      Some("""WITH s AS (
             |  SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS t,
             |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
             |      * 100 AS BIGINT)) // 100 AS BIGINT) AS x
             |  FROM lineitem GROUP BY 1
             |), gstats AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx_all,
             |    CAST(sum(x * x) AS BIGINT) AS qx_all
             |  FROM s
             |), pair AS (
             |  SELECT CAST(l.lag AS INTEGER) AS lag,
             |    CAST(count(*) AS BIGINT) AS n_pairs,
             |    CAST(sum(a.x * b.x) AS BIGINT) AS sxy,
             |    CAST(sum(a.x) AS BIGINT) AS sx,
             |    CAST(sum(b.x) AS BIGINT) AS sy
             |  FROM s a
             |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
             |  JOIN s b ON b.t = a.t + l.lag
             |  GROUP BY 1
             |), g2 AS (
             |  SELECT *, CAST(sx_all AS DOUBLE) / n AS mean_all
             |  FROM gstats
             |)
             |SELECT lag, n_pairs,
             |  (CAST(sxy AS DOUBLE) - mean_all * (sx + sy)
             |   + CAST(n_pairs AS DOUBLE) * mean_all * mean_all)
             |   / (CAST(qx_all AS DOUBLE)
             |      - CAST(sx_all AS DOUBLE) * CAST(sx_all AS DOUBLE)
             |        / n) AS acf
             |FROM pair, g2""".stripMargin),
    ),

    // ---- two-sided CUSUM changepoint scan over daily revenue
    // (ops/SeriesStats.cusumInt): deviations scaled by n so the
    // reference level stays integer; the max(0,·) reset recursion is
    // an ordered fold over the tiny day axis (the distributed work is
    // the axis build). DuckDB replays the recursion with a sequential
    // recursive CTE — bit-identical because everything is BIGINT.
    Q(
      "q260_cusum_changepoint",
      (s, d) => SeriesStats.cusumInt(
        Tables.lineitem(s, d)
          .groupBy(datediff(to_date(col("l_shipdate")),
            lit("1970-01-01")).as("day"))
          .agg(expr("sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))" +
            " * 100 AS BIGINT)) div 100").as("dollars")),
        "day", "dollars", kDiv = 20, hDiv = 2),
      Some("""WITH RECURSIVE s AS (
             |  SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS t,
             |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
             |      * 100 AS BIGINT)) // 100 AS BIGINT) AS x
             |  FROM lineitem GROUP BY 1
             |), g AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS total
             |  FROM s
             |), b AS MATERIALIZED (
             |  SELECT t, x, row_number() OVER (ORDER BY t) AS rn,
             |    n * x - total AS e,
             |    n * ((total // n) // 20) AS nk,
             |    n * ((total // n) // 2) AS nh
             |  FROM s, g
             |), r AS (
             |  SELECT rn, t, x, GREATEST(0, e - nk) AS sp,
             |    LEAST(0, e + nk) AS sn, nh
             |  FROM b WHERE rn = 1
             |  UNION ALL
             |  SELECT b.rn, b.t, b.x,
             |    GREATEST(0, r.sp + b.e - b.nk),
             |    LEAST(0, r.sn + b.e + b.nk), b.nh
             |  FROM r JOIN b ON b.rn = r.rn + 1
             |)
             |SELECT t, x, CAST(sp AS BIGINT) AS s_pos,
             |  CAST(sn AS BIGINT) AS s_neg,
             |  sp > nh AS alarm_hi, sn < -nh AS alarm_lo
             |FROM r""".stripMargin),
    ),

    // ---- per-user integer EWMA of event values
    // (ops/SeriesStats.ewmaInt, α = 1/8 with sign-guarded integer
    // division): the fold is per key, so the cluster parallelism is
    // |users| and per-key state is one BIGINT. DuckDB replays the
    // same recursion with a keyed recursive CTE.
    Q(
      "q261_ewma",
      (s, d) => SeriesStats.ewmaInt(
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents")),
        "user_id", Seq("ts", "event_id"), "cents", den = 8),
      Some("""WITH RECURSIVE v AS (
             |  SELECT user_id, event_id, ts,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS x
             |  FROM events
             |), b AS (
             |  SELECT user_id, x,
             |    CAST(row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS INTEGER) AS rn
             |  FROM v
             |), r AS (
             |  SELECT user_id, rn, x, x AS ewma FROM b WHERE rn = 1
             |  UNION ALL
             |  SELECT b.user_id, b.rn, b.x,
             |    CASE WHEN b.x - r.ewma >= 0
             |      THEN r.ewma + (b.x - r.ewma) // 8
             |      ELSE r.ewma - ((r.ewma - b.x) // 8) END
             |  FROM r JOIN b
             |    ON b.user_id = r.user_id AND b.rn = r.rn + 1
             |)
             |SELECT user_id, rn, x, CAST(ewma AS BIGINT) AS ewma
             |FROM r""".stripMargin),
    ),

    // ---- reciprocal-rank fusion of two part rankings (by revenue,
    // by shipped quantity): rank lists from two exact aggregations,
    // RRF terms as INTEGER-scaled 10⁹/(60+rank) divisions (a double
    // 1/(k+r) sum would be partial-aggregation-order-sensitive; the
    // integer form is exact), deterministic top-100.
    Q(
      "q262_rrf_fusion",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
        val agg = Tables.lineitem(s, d)
          .groupBy($"l_partkey")
          .agg(
            expr("sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))" +
              " * 100 AS BIGINT))").as("rev_c"),
            expr("sum(CAST(CAST(l_quantity AS DECIMAL(18,2))" +
              " * 100 AS BIGINT))").as("qty_c"))
          .withColumn("rank_rev", row_number().over(
            w.orderBy($"rev_c".desc, $"l_partkey".asc)))
          .withColumn("rank_qty", row_number().over(
            w.orderBy($"qty_c".desc, $"l_partkey".asc)))
          .withColumn("rrf_score", expr(
            "1000000000 div (60 + rank_rev)" +
              " + 1000000000 div (60 + rank_qty)"))
        agg.orderBy($"rrf_score".desc, $"l_partkey".asc)
          .select($"l_partkey", $"rank_rev", $"rank_qty", $"rrf_score")
          .limit(100)
      },
      Some("""WITH a AS (
             |  SELECT l_partkey,
             |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
             |      * 100 AS BIGINT)) AS BIGINT) AS rev_c,
             |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2))
             |      * 100 AS BIGINT)) AS BIGINT) AS qty_c
             |  FROM lineitem GROUP BY 1
             |), rk AS (
             |  SELECT l_partkey,
             |    CAST(row_number() OVER (ORDER BY rev_c DESC,
             |      l_partkey ASC) AS INTEGER) AS rank_rev,
             |    CAST(row_number() OVER (ORDER BY qty_c DESC,
             |      l_partkey ASC) AS INTEGER) AS rank_qty
             |  FROM a
             |)
             |SELECT l_partkey, rank_rev, rank_qty,
             |  CAST(1000000000 // (60 + rank_rev)
             |    + 1000000000 // (60 + rank_qty) AS BIGINT)
             |    AS rrf_score
             |FROM rk
             |ORDER BY rrf_score DESC, l_partkey ASC LIMIT 100"""
        .stripMargin),
    ),

    // ---- empirical-Bayes rate shrinkage: per-supplier return rates
    // pulled toward the pooled rate with prior strength 20 (the
    // beta-prior posterior-mean form). One hash aggregation for the
    // per-supplier counts, a broadcast scalar for the pool, and one
    // fixed-shape formula — no per-group float sums anywhere.
    Q(
      "q263_eb_shrinkage",
      (s, d) => {
        import s.implicits._
        val per = Tables.lineitem(s, d)
          .groupBy($"l_suppkey")
          .agg(count(lit(1)).as("n"),
            sum(($"l_returnflag" === "R").cast("long")).as("r"))
        val pool = Tables.lineitem(s, d)
          .agg(count(lit(1)).as("n_tot"),
            sum(($"l_returnflag" === "R").cast("long")).as("r_tot"))
        per.crossJoin(broadcast(pool))
          .withColumn("raw_rate", expr("CAST(r AS DOUBLE) / n"))
          .withColumn("shrunk_rate", expr(
            "(r + 20.0 * (CAST(r_tot AS DOUBLE) / n_tot)) / (n + 20)"))
          .select($"l_suppkey", $"n", $"r", $"raw_rate",
            $"shrunk_rate")
      },
      Some("""WITH per AS (
             |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
             |      END) AS BIGINT) AS r
             |  FROM lineitem GROUP BY 1
             |), pool AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_tot,
             |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
             |      END) AS BIGINT) AS r_tot
             |  FROM lineitem
             |)
             |SELECT l_suppkey, n, r,
             |  CAST(r AS DOUBLE) / n AS raw_rate,
             |  (r + 20.0 * (CAST(r_tot AS DOUBLE) / n_tot)) / (n + 20)
             |    AS shrunk_rate
             |FROM per, pool""".stripMargin),
    ),

    // ---- trailing 7-day distinct active users per day
    // (ops/TemporalJoins.slidingDistinct): presence fan-out + dedupe
    // instead of the inexpressible windowed COUNT DISTINCT; the
    // oracle brute-forces the day-range join. All-integer day axis.
    Q(
      "q258_sliding_distinct",
      (s, d) => TemporalJoins.slidingDistinct(
        Tables.events(s, d)
          .select(col("user_id"),
            datediff(to_date(col("ts")), lit("1970-01-01")).as("day")),
        "user_id", "day", windowLen = 7),
      Some("""WITH pr AS (
             |  SELECT DISTINCT user_id AS k,
             |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
             |      AS b
             |  FROM events
             |), days AS (
             |  SELECT DISTINCT b AS window_end FROM pr
             |)
             |SELECT d.window_end,
             |  CAST(count(DISTINCT p.k) AS BIGINT) AS n_distinct
             |FROM days d JOIN pr p
             |  ON p.b BETWEEN d.window_end - 6 AND d.window_end
             |GROUP BY 1""".stripMargin),
    ),

    // ---- Jaro–Winkler name similarity over blocked part pairs: the
    // native codegen'd expression (functions/JaroWinkler.scala) whose
    // double output is BIT-compatible with DuckDB's builtin (pinned by
    // a 5,000-case differential test — empty-string and 0.7 boost
    // threshold semantics included), so the oracle hash-compares raw
    // similarity doubles. Blocking = (brand, size) equi-join: the
    // linkage pattern that keeps the pair space far under n² at scale.
    Q(
      "q264_jaro_winkler",
      (s, d) => {
        val p = Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"), col("p_size"),
            col("p_name"))
        val a = p.select(col("p_brand"), col("p_size"),
          col("p_partkey").as("p1"), col("p_name").as("n1"))
        val b = p.select(col("p_brand"), col("p_size"),
          col("p_partkey").as("p2"), col("p_name").as("n2"))
        a.join(b, Seq("p_brand", "p_size"))
          .filter(col("p1") < col("p2"))
          .select(col("p1"), col("p2"),
            JaroWinkler(col("n1"), col("n2")).as("jw"))
      },
      Some("""SELECT a.p_partkey AS p1, b.p_partkey AS p2,
             |  jaro_winkler_similarity(a.p_name, b.p_name) AS jw
             |FROM part a JOIN part b
             |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
             |  AND a.p_partkey < b.p_partkey""".stripMargin),
    ),

    // ---- 2-D skyline / Pareto frontier of parts (cheapest price,
    // largest size — ops/Skyline.scala): salted local-frontier pass +
    // tiny global pass, one sort and zero joins instead of the n²
    // NOT-EXISTS nested loop the oracle brute-forces. Comparison-only
    // semantics: equal frontier duplicates all survive on both sides.
    Q(
      "q265_skyline",
      (s, d) => Skyline.skyline2d(
        Tables.part(s, d)
          .select(col("p_partkey"),
            expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100" +
              " AS BIGINT)").as("price_c"),
            col("p_size").cast("long").as("size")),
        "p_partkey", "price_c", "size")
        .select(col("id").as("p_partkey"), col("minv").as("price_c"),
          col("maxv").as("size")),
      Some("""WITH t AS (
             |  SELECT p_partkey,
             |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
             |      AS BIGINT) AS price_c,
             |    CAST(p_size AS BIGINT) AS size
             |  FROM part
             |)
             |SELECT p_partkey, price_c, size FROM t a
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM t b
             |  WHERE b.price_c <= a.price_c AND b.size >= a.size
             |    AND (b.price_c < a.price_c OR b.size > a.size))"""
        .stripMargin),
    ),

    // ---- histogram quantile sketch with a carried error contract
    // (ops/SketchStats.histQuantileSketch): equi-width integer bins
    // approximate the p500/p900/p990 order totals; each emitted row
    // joins the TRUE rank-r value (two-pass global row number) and a
    // within-bound flag that a binning bug would flip loudly. The
    // oracle rebuilds bins, ranks, and the exact selection in SQL.
    Q(
      "q266_hist_quantile_sketch",
      (s, d) => SketchStats.histQuantileSketch(
        Tables.orders(s, d)
          .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))" +
            " * 100 AS BIGINT)").as("cents")),
        "cents", nBins = 64, psPermille = Seq(500, 900, 990)),
      Some("""WITH v AS (
             |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
             |    AS BIGINT) AS v
             |  FROM orders
             |), g AS (
             |  SELECT CAST(min(v) AS BIGINT) AS mn,
             |    CAST(max(v) AS BIGINT) AS mx,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST((max(v) - min(v)) // 64 + 1 AS BIGINT) AS w
             |  FROM v
             |), b AS (
             |  SELECT (v - mn) // w AS bin, count(*) AS c
             |  FROM v, g GROUP BY 1
             |), cumt AS (
             |  SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM b
             |), ps AS (
             |  SELECT CAST(unnest([500, 900, 990]) AS INTEGER)
             |    AS p_permille
             |), tgt AS (
             |  SELECT p_permille,
             |    CAST((p_permille * n + 999) // 1000 AS BIGINT) AS r,
             |    mn, w
             |  FROM ps, g
             |), sel AS (
             |  SELECT p_permille, r, mn, w,
             |    CAST(min(bin) AS BIGINT) AS bin
             |  FROM tgt JOIN cumt ON cum >= r
             |  GROUP BY 1, 2, 3, 4
             |), rv AS (
             |  SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v
             |)
             |SELECT p_permille, r,
             |  mn + bin * w AS est_lo,
             |  mn + (bin + 1) * w - 1 AS est_hi,
             |  rv.v AS exact,
             |  rv.v BETWEEN mn + bin * w AND mn + (bin + 1) * w - 1
             |    AS within_bound
             |FROM sel JOIN rv ON rv.rn = sel.r""".stripMargin),
    ),

    // ---- bounded-hop WEIGHTED shortest paths from a seed set
    // (ops/GraphOps.shortestPathsBounded): Bellman–Ford rounds — one
    // edge-relax join + min-agg per hop, O(maxHops) plan depth, no
    // path enumeration. The oracle enumerates weighted paths ≤ 4 hops
    // in a recursive CTE and min-folds — exponential, test-scale-only
    // (the same scale split Hierarchy.bfsDistances documents). Graph
    // and integer weights are derived deterministically from supplier
    // keys, identical formulas on both sides.
    Q(
      "q268_shortest_path",
      (s, d) => {
        val sup = Tables.supplier(s, d)
          .select(col("s_suppkey").cast("long").as("a"))
        val e1 = sup.select(col("a").as("src"),
          expr("(a * 2) % 100 + 1").as("dst"))
        val e2 = sup.select(col("a").as("src"),
          expr("(a + 37) % 100 + 1").as("dst"))
        val e3 = sup.filter(expr("a % 3 = 0"))
          .select(col("a").as("src"),
            expr("(a * 5 + 11) % 100 + 1").as("dst"))
        val edges = e1.union(e2).union(e3)
          .withColumn("w", expr("(src * 7 + dst * 11) % 20 + 1"))
        val seeds = sup.filter(expr("a % 10 = 0"))
          .select(col("a").as("node"))
        GraphOps.shortestPathsBounded(edges, seeds, maxHops = 4)
      },
      Some("""WITH RECURSIVE sup AS (
             |  SELECT CAST(s_suppkey AS BIGINT) AS a FROM supplier
             |), e AS (
             |  SELECT a AS src, (a * 2) % 100 + 1 AS dst FROM sup
             |  UNION ALL
             |  SELECT a, (a + 37) % 100 + 1 FROM sup
             |  UNION ALL
             |  SELECT a, (a * 5 + 11) % 100 + 1 FROM sup
             |  WHERE a % 3 = 0
             |), ew AS (
             |  SELECT src, dst, (src * 7 + dst * 11) % 20 + 1 AS w
             |  FROM e
             |), sp AS (
             |  SELECT a AS node, CAST(0 AS BIGINT) AS dist, 0 AS hops
             |  FROM sup WHERE a % 10 = 0
             |  UNION ALL
             |  SELECT ew.dst, sp.dist + ew.w, sp.hops + 1
             |  FROM ew JOIN sp ON ew.src = sp.node
             |  WHERE sp.hops < 4
             |)
             |SELECT node, CAST(min(dist) AS BIGINT) AS dist
             |FROM sp GROUP BY 1""".stripMargin),
    ),

    // ---- mergeable-sketch distinct set operations: per-event-type
    // user sets as DataSketches HLL (hll_sketch_agg — the 100-TB
    // shape: sketches merge across shards, the exact twin needs a
    // full distinct shuffle per pair), pairwise union via hll_union,
    // intersection by inclusion–exclusion, each GATED against the
    // exact answer (≤2% + 5 absolute — sparse-mode HLL is exact at
    // these cardinalities, so the verdicts are stable booleans the
    // oracle restates as true alongside the exact counts).
    Q(
      "q269_distinct_setops",
      (s, d) => {
        import s.implicits._
        val u = Tables.events(s, d)
          .select($"event_type", $"user_id")
        val per = u.groupBy($"event_type")
          .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
            count_distinct($"user_id").as("exact_n"))
        val a = per.select($"event_type".as("type_a"),
          $"sk".as("sk_a"), $"exact_n".as("exact_a"))
        val b = per.select($"event_type".as("type_b"),
          $"sk".as("sk_b"), $"exact_n".as("exact_b"))
        val pairs = a.crossJoin(b).filter($"type_a" < $"type_b")
          .withColumn("est_union",
            expr("hll_sketch_estimate(hll_union(sk_a, sk_b))")
              .cast("long"))
          .withColumn("est_inter",
            $"exact_a" + $"exact_b" - $"est_union")
        val exactInter = u.select($"event_type".as("type_a"),
            $"user_id")
          .join(u.select($"event_type".as("type_b"), $"user_id"),
            Seq("user_id"))
          .filter($"type_a" < $"type_b")
          .select($"type_a", $"type_b", $"user_id").distinct()
          .groupBy($"type_a", $"type_b")
          .agg(count(lit(1)).as("exact_inter"))
        pairs.join(exactInter, Seq("type_a", "type_b"), "left")
          .na.fill(0L, Seq("exact_inter"))
          .select($"type_a", $"type_b", $"exact_a", $"exact_b",
            ($"exact_a" + $"exact_b" - $"exact_inter")
              .as("exact_union"),
            $"exact_inter",
            (abs($"est_union" - ($"exact_a" + $"exact_b"
              - $"exact_inter"))
              <= ($"exact_a" + $"exact_b" - $"exact_inter") / 50 + 5)
              .as("union_ok"),
            (abs($"est_inter" - $"exact_inter")
              <= $"exact_inter" / 50 + 5).as("inter_ok"))
      },
      Some("""WITH u AS (
             |  SELECT DISTINCT event_type, user_id FROM events
             |), per AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n
             |  FROM u GROUP BY 1
             |), inter AS (
             |  SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    CAST(count(*) AS BIGINT) AS exact_inter
             |  FROM u a JOIN u b ON a.user_id = b.user_id
             |    AND a.event_type < b.event_type
             |  GROUP BY 1, 2
             |)
             |SELECT pa.event_type AS type_a, pb.event_type AS type_b,
             |  pa.n AS exact_a, pb.n AS exact_b,
             |  pa.n + pb.n - coalesce(i.exact_inter, 0) AS exact_union,
             |  coalesce(i.exact_inter, 0) AS exact_inter,
             |  true AS union_ok, true AS inter_ok
             |FROM per pa JOIN per pb ON pa.event_type < pb.event_type
             |LEFT JOIN inter i ON i.type_a = pa.event_type
             |  AND i.type_b = pb.event_type""".stripMargin),
    ),

    // ---- business-day shipping latency: weekdays between order and
    // first shipment via the closed-form cumulative weekday count
    // (TemporalJoins.businessDayCumSql — integer arithmetic, no
    // calendar explode/table, so the fact scan stays one aggregation
    // at any scale). Histogram by latency so the output is compact.
    Q(
      "q270_business_days",
      (s, d) => {
        import s.implicits._
        val firstShip = Tables.lineitem(s, d)
          .groupBy($"l_orderkey")
          .agg(min($"l_shipdate").as("first_ship"))
        val h = TemporalJoins.businessDayCumSql(_: String, "div")
        Tables.orders(s, d)
          .join(firstShip, $"o_orderkey" === $"l_orderkey")
          .select(
            datediff(to_date($"o_orderdate"), lit("1970-01-01"))
              .cast("long").as("od"),
            datediff(to_date($"first_ship"), lit("1970-01-01"))
              .cast("long").as("sd"))
          .select((expr(h("sd")) - expr(h("od"))).as("biz_days"))
          .groupBy($"biz_days")
          .agg(count(lit(1)).as("n_orders"))
      },
      Some {
        val h = (c: String) =>
          graft.ops.TemporalJoins.businessDayCumSql(c, "//")
        s"""WITH f AS (
           |  SELECT l_orderkey, min(l_shipdate) AS first_ship
           |  FROM lineitem GROUP BY 1
           |), v AS (
           |  SELECT
           |    CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01'
           |      AS BIGINT) AS od,
           |    CAST(CAST(f.first_ship AS DATE) - DATE '1970-01-01'
           |      AS BIGINT) AS sd
           |  FROM orders o JOIN f ON f.l_orderkey = o.o_orderkey
           |)
           |SELECT (${h("sd")}) - (${h("od")}) AS biz_days,
           |  CAST(count(*) AS BIGINT) AS n_orders
           |FROM v GROUP BY 1""".stripMargin
      },
    ),

    // ---- incremental aggregate maintenance (ops/Incremental.scala):
    // a signed CDC delta (late inserts + tombstoned deletes) folds
    // into the materialized per-type (count, cents) aggregate — one
    // shuffle of |delta|, no base rescan. The oracle recomputes from
    // the effective row set directly; equality IS the maintenance
    // identity being tested.
    Q(
      "q271_incremental_agg",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"event_id", $"event_type",
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents"))
        val base = ev.filter($"event_id" % 10 =!= 0)
        val inserts = ev.filter($"event_id" % 10 === 0)
        val deletes = base.filter($"event_id" % 7 === 3)
        val baseAgg = base.groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"cents").as("s"))
        val delta = inserts.select($"event_type", lit(1L).as("sgn"),
            $"cents")
          .union(deletes.select($"event_type", lit(-1L).as("sgn"),
            $"cents"))
        Incremental.applyCdcToAgg(baseAgg, delta,
          "event_type", "sgn", "cents")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, event_type,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events
             |), eff AS (
             |  SELECT event_type, cents FROM ev
             |  WHERE event_id % 10 != 0 AND NOT
             |    (event_id % 10 != 0 AND event_id % 7 = 3)
             |  UNION ALL
             |  SELECT event_type, cents FROM ev WHERE event_id % 10 = 0
             |)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(cents) AS BIGINT) AS s
             |FROM eff GROUP BY 1
             |HAVING count(*) != 0""".stripMargin),
    ),

    // ---- incremental JOIN maintenance (Incremental.joinDelta): CDC
    // on BOTH join sides (late orders + lineitem corrections) folds
    // into a materialized revenue-per-customer aggregate via the IVM
    // identity Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB with signed
    // multiplicities — the base⋈base term (quadratic in history at
    // 100 TB) never recomputes. The oracle rebuilds the view from the
    // effective row sets; equality IS the identity under test.
    Q(
      "q272_join_delta_ivm",
      (s, d) => {
        import s.implicits._
        val ordersAll = Tables.orders(s, d)
          .select($"o_orderkey", $"o_custkey")
        val liAll = Tables.lineitem(s, d).select(
          $"l_orderkey".as("o_orderkey"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100" +
            " AS BIGINT)").as("cents"),
          $"l_linenumber")
        val aOld = ordersAll.filter($"o_orderkey" % 10 =!= 5)
        val dA = ordersAll.filter($"o_orderkey" % 10 === 5)
          .withColumn("sgn", lit(1L))
          .unionByName(aOld.filter($"o_orderkey" % 9 === 2)
            .withColumn("sgn", lit(-1L)))
        val bBase = liAll.filter($"l_linenumber" % 4 =!= 0)
        val bOld = bBase.drop("l_linenumber")
        val dB = liAll.filter($"l_linenumber" % 4 === 0)
          .drop("l_linenumber").withColumn("sgn", lit(1L))
          .unionByName(bBase
            .filter(($"o_orderkey" + $"l_linenumber") % 7 === 3)
            .drop("l_linenumber").withColumn("sgn", lit(-1L)))
        val vOld = aOld.join(bOld, "o_orderkey").groupBy($"o_custkey")
          .agg(count(lit(1)).as("n"), sum($"cents").as("s"))
        val dJ = Incremental
          .joinDelta(aOld, dA, bOld, dB, "o_orderkey", "sgn")
          .select($"o_custkey", $"sgn", $"cents")
        Incremental.applyCdcToAgg(vOld, dJ, "o_custkey", "sgn", "cents")
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey AS o_orderkey,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             |      AS BIGINT) AS cents,
             |    l_linenumber
             |  FROM lineitem
             |), a_new AS (
             |  SELECT o_orderkey, o_custkey FROM orders
             |  WHERE (o_orderkey % 10 != 5 AND o_orderkey % 9 != 2)
             |     OR o_orderkey % 10 = 5
             |), b_new AS (
             |  SELECT o_orderkey, cents FROM li
             |  WHERE (l_linenumber % 4 != 0
             |      AND (o_orderkey + l_linenumber) % 7 != 3)
             |     OR l_linenumber % 4 = 0
             |)
             |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(cents) AS BIGINT) AS s
             |FROM a_new JOIN b_new USING (o_orderkey)
             |GROUP BY 1""".stripMargin),
    ),

    // ---- Count–Min point-frequency gate (SketchStats.cmsPointGate):
    // one KB-sized mergeable sketch answers per-key frequency for ANY
    // key (Misra–Gries q83 tracks only the top k); the exact top-20
    // keys carry the sketch's two deterministic guarantees — never
    // undercounts, overcount ≤ ε·N — as stable booleans the oracle
    // restates beside the exact counts (the q69/q269 convention).
    Q(
      "q273_cms_point_freq",
      (s, d) => SketchStats.cmsPointGate(
        Tables.events(s, d), "user_id",
        k = 20, eps = 0.001, conf = 0.99, seed = 42),
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n,
             |  true AS overest_ok, true AS bound_ok
             |FROM events GROUP BY 1
             |ORDER BY exact_n DESC, user_id LIMIT 20""".stripMargin),
    ),

    // ---- Mann–Whitney U between two market segments' account
    // balances (RankStats.mannWhitneyUx2): tie-averaged ranks kept
    // integer by doubling (2·minrank + cnt − 1), global min-ranks via
    // the two-pass range-partitioned scan — never a single-partition
    // window. U·2 = R·2 − n(n+1), all BIGINT; DuckDB restates with
    // its native rank()/count() windows.
    Q(
      "q274_mann_whitney",
      (s, d) => {
        import s.implicits._
        RankStats.mannWhitneyUx2(
          Tables.customer(s, d)
            .filter($"c_mktsegment".isin("BUILDING", "AUTOMOBILE"))
            .select($"c_mktsegment".as("grp"),
              expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100" +
                " AS BIGINT)").as("bal_c"),
              $"c_custkey"),
          "grp", "bal_c", "c_custkey")
      },
      Some("""WITH s AS (
             |  SELECT c_mktsegment AS grp,
             |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS v,
             |    c_custkey
             |  FROM customer
             |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
             |), r AS (
             |  SELECT grp,
             |    2 * rank() OVER (ORDER BY v)
             |      + count(*) OVER (PARTITION BY v) - 1 AS rx2
             |  FROM s
             |)
             |SELECT grp, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(rx2) AS BIGINT) AS r_x2,
             |  CAST(sum(rx2) - count(*) * (count(*) + 1) AS BIGINT)
             |    AS u_x2
             |FROM r GROUP BY 1""".stripMargin),
    ),

    // ---- Spearman rank correlation between part price and size
    // (RankStats.spearman): both variables' doubled average ranks,
    // exact BIGINT sufficient sums, rho as the Pearson-on-ranks
    // formula with text SHARED verbatim with the oracle so the one
    // IEEE double is bit-identical across engines.
    Q(
      "q275_spearman",
      (s, d) => {
        import s.implicits._
        RankStats.spearman(
          Tables.part(s, d).select(
            expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100" +
              " AS BIGINT)").as("price_c"),
            $"p_size".cast("long").as("size_l"),
            $"p_partkey"),
          "price_c", "size_l", "p_partkey")
      },
      Some(s"""WITH s AS (
              |  SELECT
              |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
              |      AS BIGINT) AS x,
              |    CAST(p_size AS BIGINT) AS y,
              |    p_partkey
              |  FROM part
              |), r AS (
              |  SELECT
              |    2 * rank() OVER (ORDER BY x)
              |      + count(*) OVER (PARTITION BY x) - 1 AS rx2,
              |    2 * rank() OVER (ORDER BY y)
              |      + count(*) OVER (PARTITION BY y) - 1 AS ry2
              |  FROM s
              |), a AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(rx2) AS BIGINT) AS sx,
              |    CAST(sum(ry2) AS BIGINT) AS sy,
              |    CAST(sum(rx2 * rx2) AS BIGINT) AS sxx,
              |    CAST(sum(ry2 * ry2) AS BIGINT) AS syy,
              |    CAST(sum(rx2 * ry2) AS BIGINT) AS sxy
              |  FROM r
              |)
              |SELECT n, sx, sy, sxx, syy, sxy,
              |  ${RankStats.rhoFormula} AS rho
              |FROM a""".stripMargin),
    ),

    // ---- per-type Holt linear smoothing of daily revenue
    // (SeriesStats.holtInt): q261's EWMA recursion extended with a
    // trend term (level+trend state, both BIGINT, sign-guarded `div`),
    // so ramping series forecast the ramp instead of lagging it.
    // DuckDB replays the recursion with a keyed recursive CTE.
    Q(
      "q276_holt_linear",
      (s, d) => SeriesStats.holtInt(
        Tables.events(s, d)
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
          .agg(expr("sum(CAST(CAST(value AS DECIMAL(18,2)) * 100" +
            " AS BIGINT))").as("cents")),
        "event_type", Seq("day"), "cents", denL = 4, denT = 8),
      Some {
        def sdiv(a: String, dd: Int): String =
          s"(CASE WHEN ($a) >= 0 THEN ($a) // $dd" +
            s" ELSE -((-($a)) // $dd) END)"
        val f = "(r.level + r.trend)"
        val lNew = s"($f + ${sdiv(s"b.x - $f", 4)})"
        val bNew = s"(r.trend + ${sdiv(s"$lNew - r.level - r.trend", 8)})"
        s"""WITH RECURSIVE s AS (
           |  SELECT event_type,
           |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
           |      AS day,
           |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS x
           |  FROM events GROUP BY 1, 2
           |), b AS (
           |  SELECT event_type, x,
           |    CAST(row_number() OVER (PARTITION BY event_type
           |      ORDER BY day) AS INTEGER) AS rn
           |  FROM s
           |), r AS (
           |  SELECT event_type, rn, x, x AS level,
           |    CAST(0 AS BIGINT) AS trend, x AS forecast
           |  FROM b WHERE rn = 1
           |  UNION ALL
           |  SELECT b.event_type, b.rn, b.x, $lNew, $bNew,
           |    (r.level + r.trend)
           |  FROM r JOIN b ON b.event_type = r.event_type
           |    AND b.rn = r.rn + 1
           |)
           |SELECT event_type, rn, x, CAST(level AS BIGINT) AS level,
           |  CAST(trend AS BIGINT) AS trend,
           |  CAST(forecast AS BIGINT) AS forecast
           |FROM r""".stripMargin
      },
    ),

    // ---- largest-remainder (Hamilton) apportionment of a 10,007-unit
    // budget across event types by exact revenue share
    // (Sampling.largestRemainder): Σalloc == total GUARANTEED — the
    // property pure-div allocation trades away; remainder ranking runs
    // over the GROUP-sized result (one row per group), so the single
    // partition holds #groups rows, never data.
    Q(
      "q277_largest_remainder",
      (s, d) => Sampling.largestRemainder(
        Tables.events(s, d).select(col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents")),
        "event_type", col("cents"), total = 10007L),
      Some("""WITH w AS (
             |  SELECT event_type,
             |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
             |      AS BIGINT)) AS BIGINT) AS weight
             |  FROM events GROUP BY 1
             |), t AS (
             |  SELECT sum(weight) AS tw FROM w
             |), b AS (
             |  SELECT event_type, weight,
             |    (10007 * weight) // tw AS base,
             |    (10007 * weight) % tw AS rem
             |  FROM w, t
             |), e AS (
             |  SELECT 10007 - sum(base) AS extra FROM b
             |), r AS (
             |  SELECT event_type, weight, base,
             |    row_number() OVER (ORDER BY rem DESC, event_type)
             |      AS rk
             |  FROM b
             |)
             |SELECT event_type, weight,
             |  CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END
             |    AS BIGINT) AS alloc
             |FROM r, e""".stripMargin),
    ),

    // ---- incremental DISTINCT maintenance with HLL sketch state:
    // the holistic-aggregate counterpart of q271/q272 (exact distinct
    // cannot fold a delta — the Incremental scaladoc's caveat made
    // operational): keep a per-type sketch, union the delta
    // partition's sketch in, and the merged estimate equals a sketch
    // built over everything — gated ≤2%+5 vs the exact recompute.
    Q(
      "q278_hll_maintenance",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"event_type", $"user_id", $"event_id")
        val old = ev.filter($"event_id" % 5 =!= 0)
        val delta = ev.filter($"event_id" % 5 === 0)
        val skOld = old.groupBy($"event_type")
          .agg(expr("hll_sketch_agg(user_id, 12)").as("sk_old"))
        val skDelta = delta.groupBy($"event_type")
          .agg(expr("hll_sketch_agg(user_id, 12)").as("sk_delta"))
        val est = skOld.join(skDelta, Seq("event_type"), "full_outer")
          .withColumn("est_all",
            when($"sk_old".isNull,
              expr("hll_sketch_estimate(sk_delta)"))
              .when($"sk_delta".isNull,
                expr("hll_sketch_estimate(sk_old)"))
              .otherwise(
                expr("hll_sketch_estimate(hll_union(sk_old, sk_delta))"))
              .cast("long"))
        val exact = ev.select($"event_type", $"user_id").distinct()
          .groupBy($"event_type").agg(count(lit(1)).as("exact_all"))
        est.join(exact, "event_type")
          .select($"event_type", $"exact_all",
            (abs($"est_all" - $"exact_all") <= $"exact_all" / 50 + 5)
              .as("merge_ok"))
      },
      Some("""SELECT event_type,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_all,
             |  true AS merge_ok
             |FROM events GROUP BY 1""".stripMargin),
    ),

    // ---- one-way ANOVA F across event types on value cents: exact
    // BIGINT per-group sufficient sums; the one order-sensitive double
    // reduction (Σ s_g²/n_g over groups) runs as a SERIAL fold in
    // event_type order on the group-sized array — Spark aggregate()
    // and DuckDB list_reduce fold identically (the q254 Kaplan–Meier
    // convention), so ssb/ssw/f are bit-identical IEEE.
    Q(
      "q279_anova_f",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"event_type",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
        val g = ev.groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
            sum($"cents" * $"cents").as("ss"))
        g.agg(count(lit(1)).as("k"), sum($"n").as("nn"),
            sum($"s").as("stot"), sum($"ss").as("sstot"),
            expr("""aggregate(
              |  sort_array(collect_list(struct(event_type, n, s))),
              |  CAST(0.0 AS DOUBLE),
              |  (acc, e) -> acc + CAST(e.s AS DOUBLE)
              |    * CAST(e.s AS DOUBLE) / CAST(e.n AS DOUBLE))"""
              .stripMargin).as("sb"))
          .withColumn("ssb", expr("sb - CAST(stot AS DOUBLE)" +
            " * CAST(stot AS DOUBLE) / CAST(nn AS DOUBLE)"))
          .withColumn("ssw", expr("CAST(sstot AS DOUBLE) - sb"))
          .withColumn("f", expr("(ssb / CAST(k - 1 AS DOUBLE))" +
            " / (ssw / CAST(nn - k AS DOUBLE))"))
          .select($"k", $"nn".as("n"), $"ssb", $"ssw", $"f")
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events
             |), g AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(cents) AS BIGINT) AS s,
             |    CAST(sum(cents * cents) AS BIGINT) AS ss
             |  FROM ev GROUP BY 1
             |), t AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k,
             |    CAST(sum(n) AS BIGINT) AS nn,
             |    CAST(sum(s) AS BIGINT) AS stot,
             |    CAST(sum(ss) AS BIGINT) AS sstot,
             |    list_reduce(
             |      list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |        / CAST(n AS DOUBLE) ORDER BY event_type),
             |      (a, b) -> a + b) AS sb
             |  FROM g
             |), u AS (
             |  SELECT k, nn,
             |    sb - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
             |      / CAST(nn AS DOUBLE) AS ssb,
             |    CAST(sstot AS DOUBLE) - sb AS ssw
             |  FROM t
             |)
             |SELECT k, nn AS n, ssb, ssw,
             |  (ssb / CAST(k - 1 AS DOUBLE))
             |    / (ssw / CAST(nn - k AS DOUBLE)) AS f
             |FROM u""".stripMargin),
    ),

    // ---- Poisson(1) bootstrap over event values
    // (Sampling.poissonBootstrap): 32 replica means from ONE scan +
    // one map-side-combined aggregation — no per-replica shuffles, no
    // resampled data movement; CI = quantiles of the replica means.
    // Weights invert the Poisson CDF at fixed integer thresholds over
    // the portable 60-bit md5 hash, so DuckDB restates every weight
    // and mean bit-exactly.
    Q(
      "q280_bootstrap_ci",
      (s, d) => Sampling.poissonBootstrap(
        Tables.events(s, d).select(col("event_id"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents")),
        "event_id", "cents", reps = 32, seed = "bs42"),
      Some("""WITH r AS (
             |  SELECT range AS rep FROM range(32)
             |), ev AS (
             |  SELECT event_id,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS v
             |  FROM events
             |), h AS (
             |  SELECT rep, v,
             |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
             |      || '|bs42|' || CAST(rep AS VARCHAR)), 1, 15)
             |      AS BIGINT) % 1000000 AS u
             |  FROM ev, r
             |), w AS (
             |  SELECT rep, v,
             |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
             |      WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
             |      WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
             |      WHEN u < 999917 THEN 6 WHEN u < 999990 THEN 7
             |      ELSE 8 END AS wt
             |  FROM h
             |)
             |SELECT CAST(rep AS BIGINT) AS rep,
             |  CAST(sum(wt) AS BIGINT) AS n,
             |  CAST(sum(wt * v) AS BIGINT) AS s,
             |  CAST(CASE WHEN sum(wt) = 0 THEN NULL
             |    WHEN sum(wt * v) >= 0 THEN sum(wt * v) // sum(wt)
             |    ELSE -((-sum(wt * v)) // sum(wt)) END AS BIGINT)
             |    AS mean_c
             |FROM w GROUP BY 1""".stripMargin),
    ),

    // ---- winsorized per-type mean: clamp event cents at the global
    // exact p05/p95 (SketchStats.exactQuantilesLong — the ≤7-round
    // histogram-refinement selection, rank convention "value at row
    // ceil(p·n) ascending" restated literally by the oracle), then one
    // hash aggregation — the robust-mean recipe that kills outlier
    // sensitivity without a sort.
    Q(
      "q281_winsorized_mean",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"event_type",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
        val q = SketchStats.exactQuantilesLong(ev, "cents",
          Seq(0.05, 0.95))
        val lohi = q.agg(
          min(when($"p" === 0.05, $"value")).as("lo"),
          min(when($"p" === 0.95, $"value")).as("hi"))
        ev.crossJoin(broadcast(lohi))
          .withColumn("w", greatest($"lo", least($"hi", $"cents")))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"w").as("s_w"))
          .withColumn("mean_w_c", expr("s_w div n"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events
             |), c AS (
             |  SELECT CAST(count(*) AS BIGINT) AS cnt FROM ev
             |), srt AS (
             |  SELECT cents, row_number() OVER (ORDER BY cents) AS rn
             |  FROM ev
             |), lo AS (
             |  SELECT cents AS lo FROM srt, c
             |  WHERE rn = CAST(ceil(0.05 * cnt) AS BIGINT)
             |), hi AS (
             |  SELECT cents AS hi FROM srt, c
             |  WHERE rn = CAST(ceil(0.95 * cnt) AS BIGINT)
             |)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(greatest(lo, least(hi, cents))) AS BIGINT)
             |    AS s_w,
             |  CAST(sum(greatest(lo, least(hi, cents)))
             |    // count(*) AS BIGINT) AS mean_w_c
             |FROM ev, lo, hi GROUP BY 1""".stripMargin),
    ),

    // ---- grid-blocked DBSCAN over q257's deterministic synthetic
    // coordinate field (GeoOps.dbscanGrid): core/border/noise roles and
    // min-core-id clusters from the linear-in-points neighbor join +
    // the O(log n)-round component closure — never n², never a global
    // sort. The oracle brute-forces neighbors and replays the closure
    // as a recursive CTE (the q49 pattern in 2-D).
    Q(
      "q282_dbscan_grid",
      (s, d) => GeoOps.dbscanGrid(
        Tables.events(s, d).select(col("user_id")).distinct()
          .select(col("user_id").as("id"),
            (conv(substring(md5(concat(col("user_id").cast("string"),
              lit("gx"))), 1, 6), 16, 10).cast("long") % 1500).as("x"),
            (conv(substring(md5(concat(col("user_id").cast("string"),
              lit("gy"))), 1, 6), 16, 10).cast("long") % 1500).as("y")),
        "id", "x", "y", r = 100L, minPts = 3),
      Some("""WITH RECURSIVE u AS (
             |  SELECT DISTINCT user_id FROM events
             |), p AS (
             |  SELECT user_id AS id,
             |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)
             |      || 'gx'), 1, 6) AS BIGINT) % 1500 AS x,
             |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)
             |      || 'gy'), 1, 6) AS BIGINT) % 1500 AS y
             |  FROM u
             |), e AS (
             |  SELECT a.id AS src, b.id AS dst FROM p a JOIN p b
             |  ON a.id != b.id
             |    AND (a.x - b.x) * (a.x - b.x)
             |      + (a.y - b.y) * (a.y - b.y) <= 10000
             |), deg AS (
             |  SELECT src AS id, count(*) AS nbrs FROM e GROUP BY 1
             |), core AS (
             |  SELECT p.id FROM p LEFT JOIN deg ON p.id = deg.id
             |  WHERE coalesce(deg.nbrs, 0) + 1 >= 3
             |), ce AS (
             |  SELECT src, dst FROM e
             |  WHERE src IN (SELECT id FROM core)
             |    AND dst IN (SELECT id FROM core)
             |), reach AS (
             |  SELECT src, dst FROM ce
             |  UNION
             |  SELECT r.src, c.dst FROM reach r JOIN ce c
             |    ON r.dst = c.src
             |), comp AS (
             |  SELECT src AS id, least(src, min(dst)) AS cl
             |  FROM reach GROUP BY src
             |), corecl AS (
             |  SELECT c.id, coalesce(m.cl, c.id) AS cl
             |  FROM core c LEFT JOIN comp m ON m.id = c.id
             |), border AS (
             |  SELECT e.src AS id, min(k.cl) AS bcl
             |  FROM e JOIN corecl k ON e.dst = k.id
             |  WHERE e.src NOT IN (SELECT id FROM core)
             |  GROUP BY 1
             |)
             |SELECT p.id,
             |  CASE WHEN cc.id IS NOT NULL THEN 'core'
             |    WHEN b.id IS NOT NULL THEN 'border'
             |    ELSE 'noise' END AS role,
             |  CAST(CASE WHEN cc.id IS NOT NULL THEN cc.cl
             |    WHEN b.id IS NOT NULL THEN b.bcl
             |    ELSE -1 END AS BIGINT) AS cluster_id
             |FROM p LEFT JOIN corecl cc ON p.id = cc.id
             |LEFT JOIN border b ON p.id = b.id""".stripMargin),
    ),

    // ---- canonical-document selection by Jaccard medoid
    // (Dedup.clusterMedoids): within each q49 near-dup cluster, keep
    // the member minimizing total integer per-mille Jaccard distance
    // to the others — the representative variant, not the min-id one.
    // Pairwise work is cluster_id-keyed (Σ|cluster|², bounded by the
    // clusters themselves). DuckDB replays closure + gram-set
    // distances.
    Q(
      "q283_cluster_medoids",
      (s, d) => Dedup.clusterMedoids(
        Tables.documents(s, d), "doc_id", "text", n = 3, tau = 0.5),
      Some("WITH RECURSIVE " + graft.queries.OracleSql.blockedPairCtes +
        """, edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM p
             |  UNION SELECT id_b, id_a FROM p
             |), reach AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN edges e
             |    ON r.dst = e.src
             |), comp AS (
             |  SELECT src AS id, least(src, min(dst)) AS cluster_id
             |  FROM reach GROUP BY src
             |), mem AS (
             |  SELECT comp.id, comp.cluster_id, g.t
             |  FROM comp JOIN g ON g.doc_id = comp.id
             |), dd AS (
             |  SELECT a.cluster_id, a.id AS ida, b.id AS idb,
             |    1000 - ((1000 * len(list_intersect(a.t, b.t)))
             |      // len(list_distinct(list_concat(a.t, b.t)))) AS d
             |  FROM mem a JOIN mem b
             |    ON a.cluster_id = b.cluster_id AND a.id < b.id
             |), cb AS (
             |  SELECT cluster_id, ida AS id, d FROM dd
             |  UNION ALL SELECT cluster_id, idb, d FROM dd
             |), sm AS (
             |  SELECT cluster_id, id,
             |    CAST(sum(d) AS BIGINT) AS sum_dist_milli
             |  FROM cb GROUP BY 1, 2
             |), mz AS (
             |  SELECT cluster_id, id AS medoid_id, sum_dist_milli,
             |    row_number() OVER (PARTITION BY cluster_id
             |      ORDER BY sum_dist_milli, id) AS rk,
             |    count(*) OVER (PARTITION BY cluster_id) AS nm
             |  FROM sm
             |)
             |SELECT cluster_id, medoid_id,
             |  CAST(nm AS BIGINT) AS n_members, sum_dist_milli
             |FROM mz WHERE rk = 1
             |UNION ALL
             |SELECT doc_id, doc_id, CAST(1 AS BIGINT),
             |  CAST(0 AS BIGINT)
             |FROM documents
             |WHERE doc_id NOT IN (SELECT id FROM comp)"""
        .stripMargin),
    ),

    // ---- decile lift table (the ML-eval gains chart): per user,
    // score = mean cents of the FIRST half of their event history,
    // outcome = second-half mean above the population median
    // (exactQuantilesLong) — does past spend rank future spend?
    // Deciles ride globalNtile's two-pass rank (never a
    // single-partition ntile window); every mean is a positive-integer
    // division both engines truncate identically.
    Q(
      "q284_decile_lift",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        val ev = Tables.events(s, d).select($"user_id", $"ts",
          $"event_id",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
        val r = ev.withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"user_id")))
          .filter($"cnt" >= 4)
        val first = r.filter(expr("rn <= cnt div 2")).groupBy($"user_id")
          .agg(expr("sum(cents) div count(*)").as("score_c"))
        val second = r.filter(expr("rn > cnt div 2")).groupBy($"user_id")
          .agg(expr("sum(cents) div count(*)").as("fut_c"))
        val users = first.join(second, "user_id")
        val med = SketchStats.exactQuantilesLong(users, "fut_c",
          Seq(0.5)).select($"value".as("med_fut"))
        val lab = users.crossJoin(broadcast(med))
          .withColumn("label", ($"fut_c" > $"med_fut").cast("long"))
        SketchStats.globalNtile(lab,
            Seq($"score_c".asc, $"user_id".asc), 10, "decile")
          .groupBy($"decile")
          .agg(count(lit(1)).as("n_users"),
            expr("sum(score_c) div count(*)").as("mean_score_c"),
            expr("(1000 * sum(label)) div count(*)").as("pos_pm"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, ts, event_id,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events
             |), r AS (
             |  SELECT user_id, cents,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS rn,
             |    count(*) OVER (PARTITION BY user_id) AS cnt
             |  FROM ev
             |), f AS (
             |  SELECT user_id,
             |    CAST(sum(cents) // count(*) AS BIGINT) AS score_c
             |  FROM r WHERE cnt >= 4 AND rn <= cnt // 2 GROUP BY 1
             |), s2 AS (
             |  SELECT user_id,
             |    CAST(sum(cents) // count(*) AS BIGINT) AS fut_c
             |  FROM r WHERE cnt >= 4 AND rn > cnt // 2 GROUP BY 1
             |), u AS (
             |  SELECT f.user_id, score_c, fut_c
             |  FROM f JOIN s2 ON f.user_id = s2.user_id
             |), nn AS (
             |  SELECT CAST(count(*) AS BIGINT) AS c FROM u
             |), srt AS (
             |  SELECT fut_c, row_number() OVER (ORDER BY fut_c) AS rnk
             |  FROM u
             |), med AS (
             |  SELECT fut_c AS m FROM srt, nn
             |  WHERE rnk = CAST(ceil(0.5 * c) AS BIGINT)
             |), lab AS (
             |  SELECT u.user_id, u.score_c,
             |    CASE WHEN u.fut_c > med.m THEN 1 ELSE 0 END AS label
             |  FROM u, med
             |), t AS (
             |  SELECT score_c, label, CAST(ntile(10) OVER (
             |    ORDER BY score_c, user_id) AS INT) AS decile
             |  FROM lab
             |)
             |SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             |  CAST(sum(score_c) // count(*) AS BIGINT) AS mean_score_c,
             |  CAST((1000 * sum(label)) // count(*) AS BIGINT) AS pos_pm
             |FROM t GROUP BY 1""".stripMargin),
    ),

    // ---- median/MAD robust outlier flags: global exact median of
    // event cents, MAD = exact median of absolute deviations (two
    // exactQuantilesLong passes, rank convention restated by the
    // oracle), outlier = dev > 3·MAD — the robust z-score that a
    // heavy-tailed value column doesn't poison the way mean/stddev
    // flags do. Pure integer compares after two quantile scalars.
    Q(
      "q285_mad_outliers",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"event_type",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
        val med = SketchStats.exactQuantilesLong(ev, "cents", Seq(0.5))
          .select($"value".as("med_c"))
        val dev = ev.crossJoin(broadcast(med))
          .withColumn("dev", abs($"cents" - $"med_c"))
        val mad = SketchStats.exactQuantilesLong(dev, "dev", Seq(0.5))
          .select($"value".as("mad_c"))
        dev.crossJoin(broadcast(mad))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum(($"dev" > lit(3L) * $"mad_c").cast("long"))
              .as("n_outliers"),
            max($"med_c").as("med_c"), max($"mad_c").as("mad_c"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events
             |), nn AS (
             |  SELECT CAST(count(*) AS BIGINT) AS c FROM ev
             |), s1 AS (
             |  SELECT cents, row_number() OVER (ORDER BY cents) AS rn
             |  FROM ev
             |), med AS (
             |  SELECT cents AS med_c FROM s1, nn
             |  WHERE rn = CAST(ceil(0.5 * c) AS BIGINT)
             |), dv AS (
             |  SELECT event_type, abs(cents - med_c) AS dev, med_c
             |  FROM ev, med
             |), s2 AS (
             |  SELECT dev, row_number() OVER (ORDER BY dev) AS rn
             |  FROM dv
             |), mad AS (
             |  SELECT dev AS mad_c FROM s2, nn
             |  WHERE rn = CAST(ceil(0.5 * c) AS BIGINT)
             |)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN dev > 3 * mad_c THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers,
             |  CAST(max(med_c) AS BIGINT) AS med_c,
             |  CAST(max(mad_c) AS BIGINT) AS mad_c
             |FROM dv, mad GROUP BY 1""".stripMargin),
    ),

    // ---- token-WEIGHTED document-length percentiles
    // (SketchStats.weightedQuantilesLong): "half the TOKENS live in
    // docs shorter than X" — the curriculum/packing planner's
    // question, which row-counted percentiles answer wrongly on
    // skewed corpora. Prefix weights ride the two-pass
    // range-partitioned discipline; the oracle restates the cumulative
    // rule with a window.
    Q(
      "q286_weighted_quantiles",
      (s, d) => SketchStats.weightedQuantilesLong(
        Tables.documents(s, d).select(
          length(col("text")).cast("long").as("n_chars"),
          graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")
            .as("n_tokens")),
        "n_chars", "n_tokens", Seq(0.5, 0.9, 0.99)),
      Some("""WITH dd AS (
             |  SELECT CAST(length(text) AS BIGINT) AS v,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
             |      AS BIGINT) AS w
             |  FROM documents
             |), f AS (
             |  SELECT v, sum(w) AS wv FROM dd WHERE w > 0 GROUP BY 1
             |), c AS (
             |  SELECT v, sum(wv) OVER (ORDER BY v) AS cum FROM f
             |), t AS (
             |  SELECT CAST(sum(w) AS BIGINT) AS tot FROM dd WHERE w > 0
             |), ps AS (
             |  SELECT unnest([0.5, 0.9, 0.99]) AS p
             |)
             |SELECT p, CAST(min(v) AS BIGINT) AS value
             |FROM c, t, ps
             |WHERE cum >= CAST(ceil(p * tot) AS BIGINT)
             |GROUP BY p""".stripMargin),
    ),

    // ---- join-size prediction without running the join
    // (SkewOps.joinSizeEstimate): |A⋈B| = Σ cA(k)·cB(k) from the two
    // per-key COUNT tables — a |distinct keys| join, not a |rows| one;
    // what a planner consults before committing to a strategy at
    // 100 TB. The query also RUNS the join and proves the prediction
    // exact (predicted == actual is the output contract, not a gate).
    Q(
      "q287_join_size_estimate",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select($"o_orderkey")
        val l = Tables.lineitem(s, d)
          .select($"l_orderkey".as("o_orderkey"))
        val est = graft.ops.SkewOps.joinSizeEstimate(o, l, "o_orderkey")
        val actual = o.join(l, "o_orderkey")
          .agg(count(lit(1)).as("actual_rows"))
        est.crossJoin(actual)
          .select($"predicted_rows", $"actual_rows",
            $"max_key_product",
            ($"predicted_rows" === $"actual_rows").as("exact"))
      },
      Some("""WITH ca AS (
             |  SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c
             |  FROM orders GROUP BY 1
             |), cb AS (
             |  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c
             |  FROM lineitem GROUP BY 1
             |), p AS (
             |  SELECT CAST(coalesce(sum(ca.c * cb.c), 0) AS BIGINT)
             |      AS predicted_rows,
             |    CAST(coalesce(max(ca.c * cb.c), 0) AS BIGINT)
             |      AS max_key_product
             |  FROM ca JOIN cb ON ca.k = cb.k
             |), a AS (
             |  SELECT CAST(count(*) AS BIGINT) AS actual_rows
             |  FROM orders o JOIN lineitem l
             |    ON o.o_orderkey = l.l_orderkey
             |)
             |SELECT predicted_rows, actual_rows, max_key_product,
             |  predicted_rows = actual_rows AS exact
             |FROM p, a""".stripMargin),
    ),

    // ---- inter-arrival burstiness (Goh–Barabási B = (σ−μ)/(σ+μ))
    // per user: gap sums stay exact BIGINT (gaps in MINUTES — the
    // seconds-squared sum would cross 2^53 at sf0.1; documented
    // bound), σ/μ/B as one fixed IEEE formula from the exact sums,
    // text shared with the oracle (the Welch-t convention). B → −1
    // regular, 0 Poisson, +1 bursty.
    Q(
      "q288_burstiness",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        val gaps = Tables.events(s, d)
          .select($"user_id", $"ts", $"event_id",
            $"ts".cast("long").as("sec"))
          .withColumn("gap_min",
            expr("(sec - lag(sec) OVER (PARTITION BY user_id" +
              " ORDER BY ts, event_id)) div 60"))
          .filter($"gap_min".isNotNull)
        gaps.groupBy($"user_id")
          .agg(count(lit(1)).as("n_gaps"),
            sum($"gap_min").as("sg"),
            sum($"gap_min" * $"gap_min").as("sg2"))
          .filter($"n_gaps" >= 4)
          .withColumn("b", expr(
            """CASE WHEN sg = 0 AND sg2 = 0 THEN CAST(NULL AS DOUBLE)
              |ELSE (sqrt(CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
              |    - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
              |      * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
              |  - CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
              | / (sqrt(CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
              |    - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
              |      * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
              |  + CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
              |END""".stripMargin))
      },
      Some("""WITH g AS (
             |  SELECT user_id,
             |    (CAST(floor(epoch(ts)) AS BIGINT)
             |      - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
             |        PARTITION BY user_id ORDER BY ts, event_id)) // 60
             |      AS gap_min
             |  FROM events
             |), a AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             |    CAST(sum(gap_min) AS BIGINT) AS sg,
             |    CAST(sum(gap_min * gap_min) AS BIGINT) AS sg2
             |  FROM g WHERE gap_min IS NOT NULL GROUP BY 1
             |  HAVING count(*) >= 4
             |)
             |SELECT user_id, n_gaps, sg, sg2,
             |  CASE WHEN sg = 0 AND sg2 = 0 THEN CAST(NULL AS DOUBLE)
             |  ELSE (sqrt(CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
             |      - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
             |        * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
             |    - CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
             |   / (sqrt(CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
             |      - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
             |        * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
             |    + CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
             |  END AS b
             |FROM a""".stripMargin),
    ),

    // ---- per-user event-type mix entropy in deterministic milli-nats
    // (SketchStats.groupEntropyMilli): every ln floored to integer
    // milli BEFORE the order-free BIGINT sum — the diversity gate
    // (0 = single-type user, 1000·ln k = uniform over k types).
    Q(
      "q289_mix_entropy",
      (s, d) => SketchStats.groupEntropyMilli(
        Tables.events(s, d).select(col("user_id"), col("event_type")),
        "user_id", "event_type"),
      Some("""WITH c AS (
             |  SELECT user_id, event_type,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2
             |), a AS (
             |  SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n,
             |    CAST(sum(cnt * CAST(floor(1000.0
             |      * ln(CAST(cnt AS DOUBLE))) AS BIGINT)) AS BIGINT)
             |      AS t
             |  FROM c GROUP BY 1
             |)
             |SELECT user_id, n,
             |  CAST(CAST(floor(1000.0 * ln(CAST(n AS DOUBLE)))
             |    AS BIGINT) - t // n AS BIGINT) AS h_milli
             |FROM a""".stripMargin),
    ),

    // ---- keyword-in-context concordance: ±24 chars around the first
    // 'merge' occurrence per doc — the inspection window a curation
    // review pipeline extracts at corpus scale (pure codegen'd
    // substring map, zero shuffle). Both engines share the 1-based
    // substring/locate semantics and the boundary clamp.
    Q(
      "q290_kwic",
      (s, d) => {
        import s.implicits._
        val kw = "merge"
        Tables.documents(s, d)
          .select($"doc_id", locate(kw, $"text").as("pos"),
            $"text")
          .filter($"pos" > 0)
          .select($"doc_id", $"pos".cast("long").as("pos"),
            expr(s"substring(text, greatest(1, pos - 24), " +
              s"(pos + ${kw.length} + 24) - greatest(1, pos - 24))")
              .as("snippet"))
      },
      Some("""SELECT doc_id,
             |  CAST(strpos(text, 'merge') AS BIGINT) AS pos,
             |  substring(text,
             |    greatest(1, strpos(text, 'merge') - 24),
             |    (strpos(text, 'merge') + 5 + 24)
             |      - greatest(1, strpos(text, 'merge') - 24)) AS snippet
             |FROM documents
             |WHERE strpos(text, 'merge') > 0""".stripMargin),
    ),

    // ---- first-order Markov transition matrix over each user's
    // event-type sequence: per-user LEAD pairs (keyed windows — users
    // numerous, never a global frame), exact transition counts, and
    // row-stochastic probabilities as integer per-mille divisions.
    // The behavioral-model estimation step (next-action prediction,
    // anomaly scoring) at its 100-TB shape: one window + two hash
    // aggregations.
    Q(
      "q291_markov_transitions",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        val trans = Tables.events(s, d)
          .select($"user_id", $"event_type", $"ts", $"event_id")
          .withColumn("next_type", lead($"event_type", 1).over(w))
          .filter($"next_type".isNotNull)
          .groupBy($"event_type".as("from_type"),
            $"next_type".as("to_type"))
          .agg(count(lit(1)).as("n"))
        val rowTot = trans.groupBy($"from_type")
          .agg(sum($"n").as("row_n"))
        trans.join(rowTot, "from_type")
          .select($"from_type", $"to_type", $"n",
            expr("(1000 * n) div row_n").as("p_pm"))
      },
      Some("""WITH t AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS to_type
             |  FROM events
             |), c AS (
             |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2
             |), r AS (
             |  SELECT from_type, CAST(sum(n) AS BIGINT) AS row_n
             |  FROM c GROUP BY 1
             |)
             |SELECT c.from_type, c.to_type, c.n,
             |  CAST((1000 * c.n) // r.row_n AS BIGINT) AS p_pm
             |FROM c JOIN r ON c.from_type = r.from_type"""
        .stripMargin),
    ),

    // ---- l-diversity audit (Machanavajjhala et al.) — the
    // k-anonymity (q186) companion: a quasi-identifier group is safe
    // only if its SENSITIVE attribute takes ≥ l distinct values (a
    // k-large group that's all the same diagnosis still leaks).
    // Quasi-identifiers (nation, segment); sensitive = account-balance
    // band. Two hash aggregations, release gate as a stable boolean.
    Q(
      "q292_l_diversity",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .select($"c_nationkey".cast("long").as("nation"),
            $"c_mktsegment".as("segment"),
            expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100" +
              " AS BIGINT) div 100000").as("bal_band"))
          .groupBy($"nation", $"segment")
          .agg(count(lit(1)).as("n"),
            count_distinct($"bal_band").as("n_sensitive"),
            (count_distinct($"bal_band") >= 3).as("l_ok"))
      },
      Some("""WITH v AS (
             |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
             |    c_mktsegment AS segment,
             |    CASE WHEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
             |        AS BIGINT) >= 0
             |      THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
             |        AS BIGINT) // 100000
             |      ELSE -((-CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
             |        AS BIGINT)) // 100000) END AS bal_band
             |  FROM customer
             |)
             |SELECT nation, segment, CAST(count(*) AS BIGINT) AS n,
             |  CAST(count(DISTINCT bal_band) AS BIGINT) AS n_sensitive,
             |  count(DISTINCT bal_band) >= 3 AS l_ok
             |FROM v GROUP BY 1, 2""".stripMargin),
    ),

    // ---- functional-dependency discovery (profiling beyond q250's
    // per-column stats): does A determine B? A candidate FD holds iff
    // no A-group sees two distinct Bs — one hash aggregation per
    // candidate, violations COUNTED (not just flagged) so a
    // nearly-holding FD ranks above a random pair. Candidates here:
    // orderkey→orderdate (holds), partkey→suppkey (fails),
    // orderkey→shipdate (fails).
    Q(
      "q293_fd_discovery",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        def fd(name: String, df: org.apache.spark.sql.DataFrame,
            a: String, b: String) = df
          .groupBy(col(a)).agg(count_distinct(col(b)).as("__nb"))
          .agg(lit(name).as("fd"), count(lit(1)).as("n_groups"),
            sum(when(col("__nb") > 1, 1L).otherwise(0L))
              .as("n_violating"))
          .withColumn("holds", $"n_violating" === 0L)
        val c1 = fd("orderkey->orderdate",
          li.join(o, $"l_orderkey" === $"o_orderkey")
            .select($"l_orderkey".as("a"),
              $"o_orderdate".cast("string").as("b")), "a", "b")
        val c2 = fd("partkey->suppkey",
          li.select($"l_partkey".as("a"), $"l_suppkey".as("b")),
          "a", "b")
        val c3 = fd("orderkey->shipdate",
          li.select($"l_orderkey".as("a"),
            $"l_shipdate".cast("string").as("b")), "a", "b")
        c1.unionByName(c2).unionByName(c3)
      },
      Some("""WITH c1 AS (
             |  SELECT 'orderkey->orderdate' AS fd,
             |    CAST(count(*) AS BIGINT) AS n_groups,
             |    CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_violating
             |  FROM (
             |    SELECT l.l_orderkey,
             |      count(DISTINCT CAST(o.o_orderdate AS VARCHAR)) AS nb
             |    FROM lineitem l JOIN orders o
             |      ON l.l_orderkey = o.o_orderkey
             |    GROUP BY 1)
             |), c2 AS (
             |  SELECT 'partkey->suppkey',
             |    CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS nb
             |    FROM lineitem GROUP BY 1)
             |), c3 AS (
             |  SELECT 'orderkey->shipdate',
             |    CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM (SELECT l_orderkey,
             |      count(DISTINCT CAST(l_shipdate AS VARCHAR)) AS nb
             |    FROM lineitem GROUP BY 1)
             |)
             |SELECT fd, n_groups, n_violating,
             |  n_violating = 0 AS holds
             |FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2
             |  UNION ALL SELECT * FROM c3)""".stripMargin),
    ),

    // ---- time-weighted average value (TWAP) per user: each event's
    // value holds until the next event; TWAP = Σ vᵢ·Δtᵢ div Σ Δtᵢ —
    // the telemetry/pricing mean a row-weighted average gets wrong
    // whenever sampling is irregular. Keyed LEAD window + exact BIGINT
    // sums (cents·seconds ≤ ~1.5e15 at sf0.1; lift to DECIMAL beyond —
    // documented); one positive integer division both engines
    // truncate identically.
    Q(
      "q294_twap",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"sec", $"event_id")
        Tables.events(s, d)
          .select($"user_id", $"event_id",
            $"ts".cast("long").as("sec"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents"))
          .withColumn("next_sec", lead($"sec", 1).over(w))
          .filter($"next_sec".isNotNull && $"next_sec" > $"sec")
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_steps"),
            sum($"next_sec" - $"sec").as("dur_s"),
            sum($"cents" * ($"next_sec" - $"sec")).as("vt"))
          .withColumn("twap_c", expr("vt div dur_s"))
      },
      Some("""WITH v AS (
             |  SELECT user_id, event_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events
             |), st AS (
             |  SELECT user_id, cents, sec,
             |    lead(sec) OVER (PARTITION BY user_id
             |      ORDER BY sec, event_id) AS next_sec
             |  FROM v
             |)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_steps,
             |  CAST(sum(next_sec - sec) AS BIGINT) AS dur_s,
             |  CAST(sum(cents * (next_sec - sec)) AS BIGINT) AS vt,
             |  CAST(sum(cents * (next_sec - sec))
             |    // sum(next_sec - sec) AS BIGINT) AS twap_c
             |FROM st WHERE next_sec IS NOT NULL AND next_sec > sec
             |GROUP BY 1""".stripMargin),
    ),

    // ---- Lorenz / Pareto concentration table ("the top decile of
    // users drives X‰ of revenue"): users ranked by exact revenue
    // DESC through globalNtile's two-pass rank, per-decile sums, and
    // the cumulative share as integer per-mille over the 10-row
    // decile frame (the documented model-sized window exception) —
    // the table form of the q195 Gini scalar.
    Q(
      "q295_lorenz_deciles",
      (s, d) => {
        import s.implicits._
        val perUser = Tables.events(s, d)
          .groupBy($"user_id")
          .agg(expr("sum(CAST(CAST(value AS DECIMAL(18,2)) * 100" +
            " AS BIGINT))").as("cents"))
        val tiled = SketchStats.globalNtile(perUser,
          Seq($"cents".desc, $"user_id".asc), 10, "decile")
        val perTile = tiled.groupBy($"decile")
          .agg(count(lit(1)).as("n_users"), sum($"cents").as("cents"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy($"decile".asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions
            .Window.currentRow)
        perTile
          .crossJoin(broadcast(
            perTile.agg(sum($"cents").as("__tot"))))
          .withColumn("cum_pm",
            expr("(1000 * sum(cents) OVER (ORDER BY decile" +
              " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))" +
              " div __tot"))
          .select($"decile", $"n_users", $"cents", $"cum_pm")
      },
      Some("""WITH pu AS (
             |  SELECT user_id,
             |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
             |      AS BIGINT)) AS BIGINT) AS cents
             |  FROM events GROUP BY 1
             |), t AS (
             |  SELECT cents, CAST(ntile(10) OVER (
             |    ORDER BY cents DESC, user_id) AS INT) AS decile
             |  FROM pu
             |), pt AS (
             |  SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             |    CAST(sum(cents) AS BIGINT) AS cents
             |  FROM t GROUP BY 1
             |), tot AS (
             |  SELECT CAST(sum(cents) AS BIGINT) AS tt FROM pt
             |)
             |SELECT decile, n_users, cents,
             |  CAST((1000 * sum(cents) OVER (ORDER BY decile
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |    // tt AS BIGINT) AS cum_pm
             |FROM pt, tot""".stripMargin),
    ),

    // ---- multinomial Naive Bayes train/score/eval in one plan
    // (Scoring.naiveBayesConfusionMilli): Laplace-smoothed
    // log-likelihoods as deterministic integer milli-nats, a
    // model-sized classes×vocab grid broadcast to score the held-out
    // hash split, deterministic argmax, confusion matrix out. The
    // fixture's sources are near-uniform (the matrix shows it) — the
    // oracled deliverable is the classifier machinery, not the
    // accuracy.
    Q(
      "q296_naive_bayes",
      (s, d) => graft.ops.Scoring.naiveBayesConfusionMilli(
        Tables.documents(s, d), "doc_id", "text", "source",
        seed = "nb8"),
      Some("""WITH toks AS (
             |  SELECT doc_id, source AS lbl,
             |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
             |      || 'nb8'), 1, 15) AS BIGINT) % 5 AS s,
             |    unnest(regexp_split_to_array(trim(text), '\s+')) AS t
             |  FROM documents
             |), train AS (
             |  SELECT * FROM toks WHERE s != 0
             |), test AS (
             |  SELECT * FROM toks WHERE s = 0
             |), cc AS (
             |  SELECT lbl AS c, CAST(count(*) AS BIGINT) AS ctot,
             |    CAST(count(DISTINCT doc_id) AS BIGINT) AS cdocs
             |  FROM train GROUP BY 1
             |), vocab AS (
             |  SELECT DISTINCT t FROM train
             |), vs AS (
             |  SELECT CAST(count(*) AS BIGINT) AS v FROM vocab
             |), td AS (
             |  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
             |  FROM train
             |), ct AS (
             |  SELECT lbl AS c, t, CAST(count(*) AS BIGINT) AS n
             |  FROM train GROUP BY 1, 2
             |), grid AS (
             |  SELECT cc.c, vocab.t,
             |    CAST(floor(1000.0 * ln(CAST(coalesce(ct.n, 0) + 1
             |        AS DOUBLE))) AS BIGINT)
             |      - CAST(floor(1000.0 * ln(CAST(cc.ctot + vs.v
             |        AS DOUBLE))) AS BIGINT) AS l
             |  FROM cc CROSS JOIN vocab CROSS JOIN vs
             |  LEFT JOIN ct ON ct.c = cc.c AND ct.t = vocab.t
             |), priors AS (
             |  SELECT cc.c,
             |    CAST(floor(1000.0 * ln(CAST(cdocs AS DOUBLE)))
             |        AS BIGINT)
             |      - CAST(floor(1000.0 * ln(CAST(td.n AS DOUBLE)))
             |        AS BIGINT) AS prior,
             |    -CAST(floor(1000.0 * ln(CAST(ctot + vs.v AS DOUBLE)))
             |      AS BIGINT) AS oov
             |  FROM cc, vs, td
             |), sc AS (
             |  SELECT te.doc_id, te.lbl, p.c, p.prior,
             |    sum(coalesce(g.l, p.oov)) + p.prior AS score
             |  FROM test te CROSS JOIN priors p
             |  LEFT JOIN grid g ON g.c = p.c AND g.t = te.t
             |  GROUP BY 1, 2, 3, 4
             |), best AS (
             |  SELECT doc_id, lbl, c, row_number() OVER (
             |    PARTITION BY doc_id ORDER BY score DESC, c ASC) AS rk
             |  FROM sc
             |)
             |SELECT lbl AS actual, c AS predicted,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM best WHERE rk = 1 GROUP BY 1, 2""".stripMargin),
    ),

    // ---- SymSpell deletion-index spell candidates
    // (TextAnalysis.symspellCandidates): typos planted by deleting a
    // hash-picked character from each ≥4-char vocabulary word; both
    // sides expand to 1-deletion neighborhoods, meet on an EQUI-join
    // (never an n² distance join), and the superset is verified by
    // the native capped edit distance. DuckDB replays deletions with
    // list comprehensions and its levenshtein builtin.
    Q(
      "q297_symspell",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select(explode(split(trim($"text"), "\\s+")).as("w"))
        val vocab = toks.groupBy($"w").agg(count(lit(1)).as("freq"))
        val typos = vocab.filter(length($"w") >= 4)
          .select($"w", pmod(graft.ops.Dedup.md5Hash60(
            concat($"w", lit("ty"))),
            length($"w").cast("long")).cast("int").as("p"))
          .select(concat($"w".substr(lit(1), $"p"),
            $"w".substr($"p" + lit(2), length($"w")))
            .as("query"))
          .distinct()
        graft.ops.TextAnalysis.symspellCandidates(
            vocab, "w", "freq", typos, "query")
          .select($"query", $"cand", $"freq", $"ed".cast("int").as("ed"))
      },
      Some("""WITH toks AS (
             |  SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
             |    AS w
             |  FROM documents
             |), vocab AS (
             |  SELECT w, CAST(count(*) AS BIGINT) AS freq
             |  FROM toks GROUP BY 1
             |), typos AS (
             |  SELECT DISTINCT substr(w, 1, p) || substr(w, p + 2)
             |    AS query
             |  FROM (
             |    SELECT w, CAST(CAST('0x' || substr(md5(w || 'ty'),
             |      1, 15) AS BIGINT) % length(w) AS INT) AS p
             |    FROM vocab WHERE length(w) >= 4)
             |), vk AS (
             |  SELECT w AS cand, freq,
             |    unnest(list_append(
             |      [substr(w, 1, i - 1) || substr(w, i + 1)
             |        for i in range(1, length(w) + 1)], w)) AS k
             |  FROM vocab
             |), qk AS (
             |  SELECT query,
             |    unnest(list_append(
             |      [substr(query, 1, i - 1) || substr(query, i + 1)
             |        for i in range(1, length(query) + 1)], query))
             |      AS k
             |  FROM typos
             |)
             |SELECT DISTINCT query, cand, freq,
             |  CAST(levenshtein(query, cand) AS INT) AS ed
             |FROM qk JOIN vk USING (k)
             |WHERE levenshtein(query, cand) <= 1""".stripMargin),
    ),

    // ---- weight-of-evidence / information-value feature binning
    // (the credit-scoring feature screen): cents deciles via
    // globalNtile, per-bin positive/negative shares in exact
    // per-million, WoE = ln(pos_share/neg_share) as the DIFFERENCE of
    // two milli-nat floors (order-free integers; zero cells clamp to
    // 1 ppm — documented), IV contribution per bin as a pure integer
    // product. label = purchase events.
    Q(
      "q298_woe_iv",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"event_id",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"),
          ($"event_type" === "purchase").cast("long").as("pos"))
        val binned = SketchStats.globalNtile(ev,
          Seq($"cents".asc, $"event_id".asc), 10, "bin")
        val per = binned.groupBy($"bin")
          .agg(count(lit(1)).as("n"), sum($"pos").as("n_pos"),
            (count(lit(1)) - sum($"pos")).as("n_neg"))
        val tot = per.agg(sum($"n_pos").as("__tp"),
          sum($"n_neg").as("__tn"))
        per.crossJoin(broadcast(tot))
          .withColumn("pos_ppm",
            greatest(lit(1L), expr("(1000000 * n_pos) div __tp")))
          .withColumn("neg_ppm",
            greatest(lit(1L), expr("(1000000 * n_neg) div __tn")))
          .withColumn("woe_milli",
            floor(lit(1000.0) * log($"pos_ppm".cast("double")))
              .cast("long")
              - floor(lit(1000.0) * log($"neg_ppm".cast("double")))
              .cast("long"))
          .withColumn("iv_contrib",
            ($"pos_ppm" - $"neg_ppm") * $"woe_milli")
          .select($"bin", $"n", $"n_pos", $"n_neg", $"pos_ppm",
            $"neg_ppm", $"woe_milli", $"iv_contrib")
      },
      Some("""WITH ev AS (
             |  SELECT event_id,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
             |      AS pos
             |  FROM events
             |), b AS (
             |  SELECT pos, CAST(ntile(10) OVER (
             |    ORDER BY cents, event_id) AS INT) AS bin
             |  FROM ev
             |), per AS (
             |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(pos) AS BIGINT) AS n_pos,
             |    CAST(count(*) - sum(pos) AS BIGINT) AS n_neg
             |  FROM b GROUP BY 1
             |), tot AS (
             |  SELECT CAST(sum(n_pos) AS BIGINT) AS tp,
             |    CAST(sum(n_neg) AS BIGINT) AS tn
             |  FROM per
             |), w AS (
             |  SELECT bin, n, n_pos, n_neg,
             |    greatest(1, (1000000 * n_pos) // tp) AS pos_ppm,
             |    greatest(1, (1000000 * n_neg) // tn) AS neg_ppm
             |  FROM per, tot
             |)
             |SELECT bin, n, n_pos, n_neg,
             |  CAST(pos_ppm AS BIGINT) AS pos_ppm,
             |  CAST(neg_ppm AS BIGINT) AS neg_ppm,
             |  CAST(CAST(floor(1000.0 * ln(CAST(pos_ppm AS DOUBLE)))
             |      AS BIGINT)
             |    - CAST(floor(1000.0 * ln(CAST(neg_ppm AS DOUBLE)))
             |      AS BIGINT) AS BIGINT) AS woe_milli,
             |  CAST((pos_ppm - neg_ppm)
             |    * (CAST(floor(1000.0 * ln(CAST(pos_ppm AS DOUBLE)))
             |        AS BIGINT)
             |      - CAST(floor(1000.0 * ln(CAST(neg_ppm AS DOUBLE)))
             |        AS BIGINT)) AS BIGINT) AS iv_contrib
             |FROM w""".stripMargin),
    ),

    // ---- difference-in-differences: treatment = even user_id
    // (synthetic assignment), period split at the exact median day
    // (exactQuantilesLong), the four cell means as truncated integer
    // divisions and DiD = (T_post−T_pre) − (C_post−C_pre) — the
    // basic causal-inference estimate as exact relational algebra.
    Q(
      "q299_diff_in_diff",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select(
          ($"user_id" % 2 === 0).cast("long").as("treated"),
          datediff(to_date($"ts"), lit("1970-01-01")).cast("long")
            .as("day"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
        val med = SketchStats.exactQuantilesLong(ev, "day", Seq(0.5))
          .select($"value".as("med_day"))
        val cells = ev.crossJoin(broadcast(med))
          .withColumn("post", ($"day" > $"med_day").cast("long"))
          .groupBy($"treated", $"post")
          .agg(count(lit(1)).as("n"),
            expr("sum(cents) div count(*)").as("mean_c"))
        val p = cells.groupBy()
          .pivot(concat($"treated", lit("_"), $"post"),
            Seq("1_1", "1_0", "0_1", "0_0"))
          .agg(first($"mean_c"))
        cells.crossJoin(broadcast(p))
          .select($"treated", $"post", $"n", $"mean_c",
            (($"1_1" - $"1_0") - ($"0_1" - $"0_0")).as("did_c"))
      },
      Some("""WITH ev AS (
             |  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END
             |      AS treated,
             |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
             |      AS day,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events
             |), nn AS (
             |  SELECT CAST(count(*) AS BIGINT) AS c FROM ev
             |), srt AS (
             |  SELECT day, row_number() OVER (ORDER BY day) AS rn
             |  FROM ev
             |), med AS (
             |  SELECT day AS med_day FROM srt, nn
             |  WHERE rn = CAST(ceil(0.5 * c) AS BIGINT)
             |), cells AS (
             |  SELECT treated,
             |    CASE WHEN day > med_day THEN 1 ELSE 0 END AS post,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(cents) // count(*) AS BIGINT) AS mean_c
             |  FROM ev, med GROUP BY 1, 2
             |), did AS (
             |  SELECT
             |    CAST(max(CASE WHEN treated = 1 AND post = 1
             |        THEN mean_c END)
             |      - max(CASE WHEN treated = 1 AND post = 0
             |        THEN mean_c END)
             |      - (max(CASE WHEN treated = 0 AND post = 1
             |        THEN mean_c END)
             |        - max(CASE WHEN treated = 0 AND post = 0
             |          THEN mean_c END)) AS BIGINT) AS did_c
             |  FROM cells
             |)
             |SELECT treated, post, n, mean_c, did_c
             |FROM cells, did""".stripMargin),
    ),

    // ---- CUPED variance reduction (Deng et al. 2013): per user,
    // pre = first-half spend mean, post = second-half mean (q284's
    // split); θ = cov(pre,post)/var(pre) from exact BIGINT sufficient
    // sums; adjusted group means computed ALGEBRAICALLY from the sums
    // (mean_adj_g = mean_post_g − θ·(mean_pre_g − mean_pre_all)) so
    // no order-sensitive double accumulation ever happens — the
    // A/B-metric denoiser at its exact-relational shape.
    Q(
      "q300_cuped",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        val ev = Tables.events(s, d).select($"user_id", $"ts",
          $"event_id",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
        val r = ev.withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"user_id")))
          .filter($"cnt" >= 4)
        val pre = r.filter(expr("rn <= cnt div 2")).groupBy($"user_id")
          .agg(expr("sum(cents) div count(*)").as("x"))
        val post = r.filter(expr("rn > cnt div 2")).groupBy($"user_id")
          .agg(expr("sum(cents) div count(*)").as("y"))
        val u = pre.join(post, "user_id")
          .withColumn("g", ($"user_id" % 2 === 0).cast("long"))
        val g = u.agg(count(lit(1)).as("n"), sum($"x").as("sx"),
          sum($"y").as("sy"), sum($"x" * $"x").as("sxx"),
          sum($"x" * $"y").as("sxy"))
        val per = u.groupBy($"g").agg(count(lit(1)).as("ng"),
          sum($"x").as("sxg"), sum($"y").as("syg"))
        per.crossJoin(broadcast(g))
          .withColumn("theta", expr(
            "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)" +
              " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
              " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
              " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"))
          .withColumn("mean_post", expr(
            "CAST(syg AS DOUBLE) / CAST(ng AS DOUBLE)"))
          .withColumn("mean_adj", expr(
            "CAST(syg AS DOUBLE) / CAST(ng AS DOUBLE)" +
              " - theta * (CAST(sxg AS DOUBLE) / CAST(ng AS DOUBLE)" +
              " - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"))
          .select($"g", $"ng", $"sxg", $"syg", $"theta",
            $"mean_post", $"mean_adj")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, cents,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS rn,
             |    count(*) OVER (PARTITION BY user_id) AS cnt
             |  FROM (SELECT user_id, ts, event_id,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents FROM events)
             |), pre AS (
             |  SELECT user_id,
             |    CAST(sum(cents) // count(*) AS BIGINT) AS x
             |  FROM ev WHERE cnt >= 4 AND rn <= cnt // 2 GROUP BY 1
             |), post AS (
             |  SELECT user_id,
             |    CAST(sum(cents) // count(*) AS BIGINT) AS y
             |  FROM ev WHERE cnt >= 4 AND rn > cnt // 2 GROUP BY 1
             |), u AS (
             |  SELECT pre.user_id, x, y,
             |    CASE WHEN pre.user_id % 2 = 0 THEN 1 ELSE 0 END AS g
             |  FROM pre JOIN post ON pre.user_id = post.user_id
             |), tt AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx,
             |    CAST(sum(x * y) AS BIGINT) AS sxy
             |  FROM u
             |), per AS (
             |  SELECT g, CAST(count(*) AS BIGINT) AS ng,
             |    CAST(sum(x) AS BIGINT) AS sxg,
             |    CAST(sum(y) AS BIGINT) AS syg
             |  FROM u GROUP BY 1
             |)
             |SELECT g, ng, sxg, syg,
             |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
             |  CAST(syg AS DOUBLE) / CAST(ng AS DOUBLE) AS mean_post,
             |  CAST(syg AS DOUBLE) / CAST(ng AS DOUBLE)
             |    - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             |      * (CAST(sxg AS DOUBLE) / CAST(ng AS DOUBLE)
             |        - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             |    AS mean_adj
             |FROM per, tt""".stripMargin),
    ),

    // ---- incremental connected components under edge inserts
    // (Incremental.applyEdgesToComponents — the graph member of the
    // IVM family): old co-purchase labels + a batch of new edges fold
    // through merge pairs on the COMPONENT graph (touched-components-
    // sized closure, never the full edge history), one relabel join.
    // The oracle recomputes components from scratch over old ∪ new —
    // equality IS the maintenance identity.
    Q(
      "q301_incremental_cc",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .filter($"l_partkey" % 7 === 0 && $"l_orderkey" % 7 === 0)
          .select($"l_orderkey", $"l_partkey")
        // materialized (r14): the self-join + distinct feeds the
        // old-edge closure AND both new-edge consumers in the
        // maintenance step — unmaterialized it executed three times
        val edges = graft.ops.Materialize(li.as("x").join(li.as("y"),
            $"x.l_orderkey" === $"y.l_orderkey"
              && $"x.l_partkey" < $"y.l_partkey")
          .select($"x.l_partkey".as("src"), $"y.l_partkey".as("dst"))
          .distinct())
        val oldEdges = edges.filter(($"src" + $"dst") % 5 =!= 0)
        val newEdges = edges.filter(($"src" + $"dst") % 5 === 0)
        val oldLabels = Dedup.duplicateClustersStar(
          oldEdges, "src", "dst")
        Incremental.applyEdgesToComponents(
          oldLabels, newEdges, "src", "dst")
      },
      Some("""WITH RECURSIVE li AS (
             |  SELECT l_orderkey, l_partkey FROM lineitem
             |  WHERE l_partkey % 7 = 0 AND l_orderkey % 7 = 0
             |), p AS (
             |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
             |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
             |    AND x.l_partkey < y.l_partkey
             |), edges AS (
             |  SELECT a AS src, b AS dst FROM p
             |  UNION SELECT b, a FROM p
             |), reach AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN edges e
             |    ON r.dst = e.src
             |), comp AS (
             |  SELECT src AS id, least(src, min(dst)) AS cluster_id
             |  FROM reach GROUP BY src
             |)
             |SELECT id, cluster_id FROM comp""".stripMargin),
    ),

    // ---- grouped MODE with a deterministic tie-break (SQL MODE's
    // order is engine-unspecified — both sides rank (count desc,
    // value asc) explicitly): the most common transaction size per
    // event type. Two hash aggregations + a per-group top-1.
    Q(
      "q302_grouped_mode",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"event_type",
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents"))
          .groupBy($"event_type", $"cents")
          .agg(count(lit(1)).as("n"))
          .groupBy($"event_type")
          .agg(min(struct((-$"n").as("__neg"), $"cents", $"n"))
            .as("__m"))
          .select($"event_type", $"__m.cents".as("mode_cents"),
            $"__m.n".as("n_mode"))
      },
      Some("""WITH c AS (
             |  SELECT event_type,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2
             |), r AS (
             |  SELECT event_type, cents, n, row_number() OVER (
             |    PARTITION BY event_type ORDER BY n DESC, cents ASC)
             |      AS rk
             |  FROM c
             |)
             |SELECT event_type, cents AS mode_cents, n AS n_mode
             |FROM r WHERE rk = 1""".stripMargin),
    ),

    // ---- forecast-accuracy audit of q276's Holt smoother: per type,
    // one-step-ahead WAPE (Σ|x−f| / Σx, integer per-mille) and bias
    // (Σ(f−x) sign) over the same day axis — the eval loop that makes
    // a forecasting op a measured capability rather than a shape. The
    // oracle replays the Holt recursion AND the error fold.
    Q(
      "q303_forecast_error",
      (s, d) => {
        import s.implicits._
        val h = SeriesStats.holtInt(
          Tables.events(s, d)
            .groupBy($"event_type",
              datediff(to_date($"ts"), lit("1970-01-01")).as("day"))
            .agg(expr("sum(CAST(CAST(value AS DECIMAL(18,2)) * 100" +
              " AS BIGINT))").as("cents")),
          "event_type", Seq("day"), "cents", denL = 4, denT = 8)
        h.filter($"rn" > 1) // rn 1 has no prior state to forecast from
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum(abs($"x" - $"forecast")).as("abs_err"),
            sum($"forecast" - $"x").as("bias"),
            sum($"x").as("actual"))
          .withColumn("wape_pm",
            expr("(1000 * abs_err) div actual"))
      },
      Some {
        def sdiv(a: String, dd: Int): String =
          s"(CASE WHEN ($a) >= 0 THEN ($a) // $dd" +
            s" ELSE -((-($a)) // $dd) END)"
        val f = "(r.level + r.trend)"
        val lNew = s"($f + ${sdiv(s"b.x - $f", 4)})"
        val bNew = s"(r.trend + ${sdiv(s"$lNew - r.level - r.trend", 8)})"
        s"""WITH RECURSIVE s AS (
           |  SELECT event_type,
           |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
           |      AS day,
           |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS x
           |  FROM events GROUP BY 1, 2
           |), b AS (
           |  SELECT event_type, x,
           |    CAST(row_number() OVER (PARTITION BY event_type
           |      ORDER BY day) AS INTEGER) AS rn
           |  FROM s
           |), r AS (
           |  SELECT event_type, rn, x, x AS level,
           |    CAST(0 AS BIGINT) AS trend, x AS forecast
           |  FROM b WHERE rn = 1
           |  UNION ALL
           |  SELECT b.event_type, b.rn, b.x, $lNew, $bNew,
           |    (r.level + r.trend)
           |  FROM r JOIN b ON b.event_type = r.event_type
           |    AND b.rn = r.rn + 1
           |)
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(abs(x - forecast)) AS BIGINT) AS abs_err,
           |  CAST(sum(forecast - x) AS BIGINT) AS bias,
           |  CAST(sum(x) AS BIGINT) AS actual,
           |  CAST((1000 * sum(abs(x - forecast))) // sum(x)
           |    AS BIGINT) AS wape_pm
           |FROM r WHERE rn > 1 GROUP BY 1""".stripMargin
      },
    ),

    // ---- binary-segmentation changepoint (CUSUM q260's offline
    // sibling): the single split of the daily-revenue series
    // minimizing total within-segment SSE, found by evaluating EVERY
    // candidate split from prefix sums over the day axis — the axis
    // is calendar-bounded (~2.4k rows), so the prefix window is the
    // documented model-sized exception, and each candidate's cost is
    // a fixed IEEE formula over exact BIGINT prefix sums (identical
    // text both engines; argmin tie-breaks on the earlier day).
    Q(
      "q304_binseg_changepoint",
      (s, d) => {
        import s.implicits._
        val axis = Tables.lineitem(s, d)
          .groupBy(datediff(to_date($"l_shipdate"), lit("1970-01-01"))
            .cast("long").as("day"))
          .agg(expr("sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))" +
            " * 100 AS BIGINT)) div 100").as("x"))
        val w = org.apache.spark.sql.expressions.Window.orderBy($"day")
          .rowsBetween(org.apache.spark.sql.expressions
            .Window.unboundedPreceding, org.apache.spark.sql
            .expressions.Window.currentRow)
        val pre = axis
          .withColumn("k", count(lit(1)).over(w))
          .withColumn("sx", sum($"x").over(w))
          .withColumn("sxx", sum($"x" * $"x").over(w))
        val tot = pre.agg(max($"k").as("n"), max($"sx").as("tsx"),
          max($"sxx").as("tsxx"))
        val cost = pre.crossJoin(broadcast(tot))
          .filter($"k" < $"n") // a split needs a non-empty right side
          .withColumn("cost", expr(
            """(CAST(sxx AS DOUBLE)
              |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
              |    / CAST(k AS DOUBLE))
              |+ (CAST(tsxx - sxx AS DOUBLE)
              |  - CAST(tsx - sx AS DOUBLE) * CAST(tsx - sx AS DOUBLE)
              |    / CAST(n - k AS DOUBLE))""".stripMargin))
        cost.agg(min(struct($"cost", $"day", $"k",
            ($"n" - $"k").as("k2"))).as("b"))
          .select($"b.day".as("split_day"), $"b.k".as("n_left"),
            $"b.k2".as("n_right"), $"b.cost".as("sse"))
      },
      Some("""WITH axis AS (
             |  SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS day,
             |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
             |      * 100 AS BIGINT)) // 100 AS BIGINT) AS x
             |  FROM lineitem GROUP BY 1
             |), pre AS (
             |  SELECT day,
             |    CAST(count(*) OVER wsum AS BIGINT) AS k,
             |    CAST(sum(x) OVER wsum AS BIGINT) AS sx,
             |    CAST(sum(x * x) OVER wsum AS BIGINT) AS sxx
             |  FROM axis
             |  WINDOW wsum AS (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |), tot AS (
             |  SELECT CAST(max(k) AS BIGINT) AS n,
             |    CAST(max(sx) AS BIGINT) AS tsx,
             |    CAST(max(sxx) AS BIGINT) AS tsxx
             |  FROM pre
             |), cost AS (
             |  SELECT day, k, n - k AS k2,
             |    (CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             |        / CAST(k AS DOUBLE))
             |    + (CAST(tsxx - sxx AS DOUBLE)
             |      - CAST(tsx - sx AS DOUBLE) * CAST(tsx - sx AS DOUBLE)
             |        / CAST(n - k AS DOUBLE)) AS cost
             |  FROM pre, tot WHERE k < n
             |), best AS (
             |  SELECT day, k, k2, cost, row_number() OVER (
             |    ORDER BY cost ASC, day ASC) AS rk
             |  FROM cost
             |)
             |SELECT day AS split_day, k AS n_left, k2 AS n_right,
             |  cost AS sse
             |FROM best WHERE rk = 1""".stripMargin),
    ),

    // ---- degree assortativity of the co-purchase graph: Pearson r
    // between endpoint degrees over the symmetrized edge list (Newman
    // 2002 — do hubs buy with hubs?). Exact BIGINT sufficient sums via
    // two hash joins of the degree table onto the edges; the one IEEE
    // value comes from RankStats' shared rho text.
    Q(
      "q305_assortativity",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .filter($"l_partkey" % 7 === 0 && $"l_orderkey" % 7 === 0)
          .select($"l_orderkey", $"l_partkey")
        val pairs = li.as("x").join(li.as("y"),
            $"x.l_orderkey" === $"y.l_orderkey"
              && $"x.l_partkey" < $"y.l_partkey")
          .select($"x.l_partkey".as("src"), $"y.l_partkey".as("dst"))
          .distinct()
        val sym = pairs.unionByName(
          pairs.select($"dst".as("src"), $"src".as("dst")))
        val deg = sym.groupBy($"src".as("node"))
          .agg(count(lit(1)).as("deg"))
        sym
          .join(deg.select($"node".as("src"), $"deg".as("dx")), "src")
          .join(deg.select($"node".as("dst"), $"deg".as("dy")), "dst")
          .agg(count(lit(1)).as("n"), sum($"dx").as("sx"),
            sum($"dy").as("sy"), sum($"dx" * $"dx").as("sxx"),
            sum($"dy" * $"dy").as("syy"),
            sum($"dx" * $"dy").as("sxy"))
          .withColumn("r", expr(graft.ops.RankStats.rhoFormula))
      },
      Some(s"""WITH li AS (
              |  SELECT l_orderkey, l_partkey FROM lineitem
              |  WHERE l_partkey % 7 = 0 AND l_orderkey % 7 = 0
              |), p AS (
              |  SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
              |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
              |    AND x.l_partkey < y.l_partkey
              |), sym AS (
              |  SELECT src, dst FROM p
              |  UNION ALL SELECT dst, src FROM p
              |), deg AS (
              |  SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
              |  FROM sym GROUP BY 1
              |), j AS (
              |  SELECT a.deg AS dx, b.deg AS dy
              |  FROM sym JOIN deg a ON sym.src = a.node
              |    JOIN deg b ON sym.dst = b.node
              |), a AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(dx) AS BIGINT) AS sx,
              |    CAST(sum(dy) AS BIGINT) AS sy,
              |    CAST(sum(dx * dx) AS BIGINT) AS sxx,
              |    CAST(sum(dy * dy) AS BIGINT) AS syy,
              |    CAST(sum(dx * dy) AS BIGINT) AS sxy
              |  FROM j
              |)
              |SELECT n, sx, sy, sxx, syy, sxy,
              |  ${graft.ops.RankStats.rhoFormula} AS r
              |FROM a""".stripMargin),
    ),

    // ---- median imputation (the data-repair op every feature
    // pipeline runs before a model that can't eat nulls): values
    // nulled on a deterministic key pattern, refilled with the
    // per-group EXACT median (exactQuantilesLongByGroup — one
    // refinement loop serves all 5 groups at once), repaired sums
    // verified. Null-handling is the point: the median sees only
    // surviving values, the fill only the holes.
    Q(
      "q306_median_impute",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"event_id", $"event_type",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
          .withColumn("holey",
            when($"event_id" % 13 === 0, lit(null))
              .otherwise($"cents"))
        val med = SketchStats.exactQuantilesLongByGroup(
            ev.filter($"holey".isNotNull), "event_type", "holey",
            Seq(0.5))
          .select($"event_type", $"value".as("med_c"))
        ev.join(med, "event_type")
          .withColumn("repaired", coalesce($"holey", $"med_c"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"holey".isNull.cast("long")).as("n_imputed"),
            max($"med_c").as("med_c"),
            sum($"repaired").as("sum_repaired"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, event_type,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents,
             |    CASE WHEN event_id % 13 = 0 THEN NULL
             |      ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100
             |        AS BIGINT) END AS holey
             |  FROM events
             |), nn AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS c
             |  FROM ev WHERE holey IS NOT NULL GROUP BY 1
             |), srt AS (
             |  SELECT event_type, holey, row_number() OVER (
             |    PARTITION BY event_type ORDER BY holey) AS rn
             |  FROM ev WHERE holey IS NOT NULL
             |), med AS (
             |  SELECT srt.event_type, holey AS med_c
             |  FROM srt JOIN nn ON srt.event_type = nn.event_type
             |  WHERE rn = CAST(ceil(0.5 * c) AS BIGINT)
             |)
             |SELECT ev.event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN holey IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_imputed,
             |  CAST(max(med_c) AS BIGINT) AS med_c,
             |  CAST(sum(coalesce(holey, med_c)) AS BIGINT)
             |    AS sum_repaired
             |FROM ev JOIN med ON ev.event_type = med.event_type
             |GROUP BY 1""".stripMargin),
    ),

    // ---- Theil–Sen robust trend (median of pairwise slopes): the
    // estimator a 30%-outlier-contaminated series can't poison, where
    // q201's OLS follows every spike. Slopes in integer micro-units
    // with the sign-guarded division; the median is an exact rank
    // selection. Pair space is the thinned calendar axis squared —
    // bounded by the calendar, not the data; full-data Theil–Sen
    // would sample pairs (documented).
    Q(
      "q307_theil_sen",
      (s, d) => {
        import s.implicits._
        val axis = Tables.lineitem(s, d)
          .groupBy(datediff(to_date($"l_shipdate"), lit("1970-01-01"))
            .cast("long").as("day"))
          .agg(expr("sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))" +
            " * 100 AS BIGINT)) div 100").as("y"))
          .filter($"day" % 3 === 0)
        // distinct lineages, not .as() aliases: a plan self-joined to
        // itself can resolve both aliased sides to the SAME attribute
        // (dx = day − day = 0 → the division throws)
        val left = axis.select($"day".as("day_a"), $"y".as("y_a"))
        val right = axis.select($"day".as("day_b"), $"y".as("y_b"))
        val pairs = left.join(right, $"day_a" < $"day_b")
          .select((($"y_b" - $"y_a") * 1000000L).as("dy"),
            ($"day_b" - $"day_a").as("dx"))
          // dx <= 0 guard is LOAD-BEARING even though the join
          // condition excludes it: the nested-loop join's codegen
          // evaluates this projection in doConsume BEFORE the
          // condition drops the diagonal row (dx = 0), and ANSI
          // division throws — the division must be total
          .select(expr("""CASE WHEN dx <= 0 THEN CAST(0 AS BIGINT)
            |WHEN dy >= 0 THEN dy div dx
            |ELSE -((-dy) div dx) END""".stripMargin)
            .as("slope_micro"))
        val med = SketchStats.exactQuantilesLong(pairs, "slope_micro",
          Seq(0.5))
        pairs.agg(count(lit(1)).as("m"))
          .crossJoin(broadcast(med.select($"value"
            .as("slope_micro_med"))))
      },
      Some("""WITH axis AS (
             |  SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS day,
             |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
             |      * 100 AS BIGINT)) // 100 AS BIGINT) AS y
             |  FROM lineitem GROUP BY 1
             |), th AS (
             |  SELECT day, y FROM axis WHERE day % 3 = 0
             |), p AS (
             |  SELECT CASE WHEN (b.y - a.y) >= 0
             |      THEN ((b.y - a.y) * 1000000) // (b.day - a.day)
             |      ELSE -((-((b.y - a.y) * 1000000))
             |        // (b.day - a.day)) END AS slope_micro
             |  FROM th a JOIN th b ON a.day < b.day
             |), m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS m FROM p
             |), srt AS (
             |  SELECT slope_micro, row_number() OVER (
             |    ORDER BY slope_micro) AS rn
             |  FROM p
             |)
             |SELECT m.m, CAST(srt.slope_micro AS BIGINT)
             |    AS slope_micro_med
             |FROM srt, m WHERE rn = CAST(ceil(0.5 * m) AS BIGINT)"""
        .stripMargin),
    ),

    // ---- exact two-sample Kolmogorov–Smirnov
    // (RankStats.ksTestScaled): D·n1·n2 = max|cum1·n2 − cum2·n1| is an
    // INTEGER, so the whole distribution comparison — q274's
    // Mann–Whitney sees location shifts, KS sees ANY shape difference
    // — hashes exactly; prefix counts ride the two-pass
    // range-partitioned discipline.
    Q(
      "q308_ks_test",
      (s, d) => {
        import s.implicits._
        RankStats.ksTestScaled(
          Tables.customer(s, d)
            .filter($"c_mktsegment".isin("BUILDING", "AUTOMOBILE"))
            .select($"c_mktsegment".as("grp"),
              expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100" +
                " AS BIGINT)").as("bal_c")),
          "grp", "bal_c")
      },
      Some("""WITH s AS (
             |  SELECT c_mktsegment AS g,
             |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS v
             |  FROM customer
             |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
             |), nn AS (
             |  SELECT
             |    CAST(sum(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n2
             |  FROM s
             |), pv AS (
             |  SELECT v,
             |    sum(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END)
             |      AS c1,
             |    sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS c2
             |  FROM s GROUP BY 1
             |), c AS (
             |  SELECT sum(c1) OVER (ORDER BY v) AS cum1,
             |    sum(c2) OVER (ORDER BY v) AS cum2
             |  FROM pv
             |)
             |SELECT n1, n2,
             |  CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT)
             |    AS d_scaled
             |FROM c, nn GROUP BY 1, 2""".stripMargin),
    ),

    // ---- seeded randomization (permutation-style) test on the same
    // two segments: 100 hash-relabeled replicas in ONE scan (the q280
    // bootstrap fan-out), each replica's |mean difference| compared to
    // the observed via cross-multiplied integers lifted to
    // DECIMAL(38,0) (the product crosses 2^63 at sf0.1 — HUGEINT on
    // the DuckDB side). Random-relabel (binomial sizes), not the
    // fixed-margin permutation — documented; sizes concentrate at
    // n/2 and the test is a valid randomization test as-is.
    Q(
      "q309_permutation_test",
      (s, d) => {
        import s.implicits._
        val base = Tables.customer(s, d)
          .filter($"c_mktsegment".isin("BUILDING", "AUTOMOBILE"))
          .select($"c_custkey",
            expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100" +
              " AS BIGINT)").as("cents"),
            ($"c_mktsegment" === "AUTOMOBILE").cast("long").as("g1"))
        val obs = base.agg(sum($"g1").as("n1"),
          sum(when($"g1" === 1L, $"cents").otherwise(0L)).as("s1"),
          (count(lit(1)) - sum($"g1")).as("n2"),
          sum(when($"g1" === 0L, $"cents").otherwise(0L)).as("s2"))
          .select($"n1", $"n2",
            abs($"s1" * $"n2" - $"s2" * $"n1").as("t_obs"))
        val reps = s.range(100).select(col("id").as("b"))
        val perms = base.crossJoin(broadcast(reps))
          .withColumn("p1", (pmod(graft.ops.Dedup.md5Hash60(
            concat($"c_custkey".cast("string"), lit("|pm|"),
              $"b".cast("string"))), lit(1000L)) < 500L).cast("long"))
          .groupBy($"b")
          .agg(sum($"p1").as("n1b"),
            sum(when($"p1" === 1L, $"cents").otherwise(0L)).as("s1b"),
            (count(lit(1)) - sum($"p1")).as("n2b"),
            sum(when($"p1" === 0L, $"cents").otherwise(0L)).as("s2b"))
          .withColumn("t_b", abs($"s1b" * $"n2b" - $"s2b" * $"n1b"))
        perms.crossJoin(broadcast(obs))
          .agg(count(lit(1)).as("n_reps"),
            sum(expr("""CASE WHEN n1b = 0 OR n2b = 0 THEN 0
              |WHEN CAST(t_b AS DECIMAL(38,0))
              |    * CAST(n1 * n2 AS DECIMAL(38,0))
              |  >= CAST(t_obs AS DECIMAL(38,0))
              |    * CAST(n1b * n2b AS DECIMAL(38,0))
              |THEN 1 ELSE 0 END""".stripMargin)).as("n_extreme"),
            max($"t_obs").as("t_obs"), max($"n1").as("n1"),
            max($"n2").as("n2"))
      },
      Some("""WITH base AS (
             |  SELECT c_custkey,
             |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents,
             |    CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0
             |      END AS g1
             |  FROM customer
             |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
             |), obs AS (
             |  SELECT CAST(sum(g1) AS BIGINT) AS n1,
             |    CAST(count(*) - sum(g1) AS BIGINT) AS n2,
             |    CAST(abs(sum(CASE WHEN g1 = 1 THEN cents ELSE 0 END)
             |        * (count(*) - sum(g1))
             |      - sum(CASE WHEN g1 = 0 THEN cents ELSE 0 END)
             |        * sum(g1)) AS BIGINT) AS t_obs
             |  FROM base
             |), r AS (
             |  SELECT range AS b FROM range(100)
             |), pm AS (
             |  SELECT b,
             |    CASE WHEN CAST('0x' || substr(md5(
             |      CAST(c_custkey AS VARCHAR) || '|pm|'
             |        || CAST(b AS VARCHAR)), 1, 15) AS BIGINT)
             |      % 1000 < 500 THEN 1 ELSE 0 END AS p1,
             |    cents
             |  FROM base, r
             |), agg AS (
             |  SELECT b, CAST(sum(p1) AS BIGINT) AS n1b,
             |    CAST(sum(CASE WHEN p1 = 1 THEN cents ELSE 0 END)
             |      AS BIGINT) AS s1b,
             |    CAST(count(*) - sum(p1) AS BIGINT) AS n2b,
             |    CAST(sum(CASE WHEN p1 = 0 THEN cents ELSE 0 END)
             |      AS BIGINT) AS s2b
             |  FROM pm GROUP BY 1
             |)
             |SELECT CAST(count(*) AS BIGINT) AS n_reps,
             |  CAST(sum(CASE WHEN n1b = 0 OR n2b = 0 THEN 0
             |    WHEN CAST(abs(s1b * n2b - s2b * n1b) AS HUGEINT)
             |        * CAST(n1 * n2 AS HUGEINT)
             |      >= CAST(t_obs AS HUGEINT)
             |        * CAST(n1b * n2b AS HUGEINT)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
             |  CAST(max(t_obs) AS BIGINT) AS t_obs,
             |  CAST(max(n1) AS BIGINT) AS n1,
             |  CAST(max(n2) AS BIGINT) AS n2
             |FROM agg, obs""".stripMargin),
    ),

    // ---- per-class precision / recall / F1 in integer per-mille —
    // the classifier-eval derivation q296's confusion matrix feeds in
    // practice, here over a self-contained deterministic predictor
    // (each event predicted as its user's MODAL type, q302's argmax
    // with the same tie-break). tp/fp/fn from two aggregations of the
    // (actual, predicted) pairs; every ratio a positive integer
    // division with an explicit zero-denominator guard.
    Q(
      "q310_precision_recall",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_id", $"event_type")
        val mode = ev.groupBy($"user_id", $"event_type")
          .agg(count(lit(1)).as("n"))
          .groupBy($"user_id")
          .agg(min(struct((-$"n").as("__neg"), $"event_type"))
            .as("__m"))
          .select($"user_id", $"__m.event_type".as("predicted"))
        val pairs = ev.join(mode, "user_id")
          .select($"event_type".as("actual"), $"predicted")
        val byActual = pairs.groupBy($"actual".as("cls"))
          .agg(count(lit(1)).as("n_actual"),
            sum(($"actual" === $"predicted").cast("long")).as("tp"))
        val byPred = pairs.groupBy($"predicted".as("cls"))
          .agg(count(lit(1)).as("n_predicted"))
        byActual.join(byPred, Seq("cls"), "full_outer")
          .na.fill(0L, Seq("n_actual", "tp", "n_predicted"))
          .withColumn("prec_pm", expr(
            "CASE WHEN n_predicted = 0 THEN 0" +
              " ELSE (1000 * tp) div n_predicted END"))
          .withColumn("rec_pm", expr(
            "CASE WHEN n_actual = 0 THEN 0" +
              " ELSE (1000 * tp) div n_actual END"))
          .withColumn("f1_pm", expr(
            "CASE WHEN prec_pm + rec_pm = 0 THEN 0" +
              " ELSE (2 * prec_pm * rec_pm) div (prec_pm + rec_pm)" +
              " END"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type FROM events
             |), cnt AS (
             |  SELECT user_id, event_type,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM ev GROUP BY 1, 2
             |), mode AS (
             |  SELECT user_id, event_type AS predicted FROM (
             |    SELECT user_id, event_type, row_number() OVER (
             |      PARTITION BY user_id
             |      ORDER BY n DESC, event_type ASC) AS rk
             |    FROM cnt) WHERE rk = 1
             |), pairs AS (
             |  SELECT ev.event_type AS actual, mode.predicted
             |  FROM ev JOIN mode ON ev.user_id = mode.user_id
             |), ba AS (
             |  SELECT actual AS cls, CAST(count(*) AS BIGINT)
             |      AS n_actual,
             |    CAST(sum(CASE WHEN actual = predicted THEN 1 ELSE 0
             |      END) AS BIGINT) AS tp
             |  FROM pairs GROUP BY 1
             |), bp AS (
             |  SELECT predicted AS cls, CAST(count(*) AS BIGINT)
             |      AS n_predicted
             |  FROM pairs GROUP BY 1
             |), j AS (
             |  SELECT coalesce(ba.cls, bp.cls) AS cls,
             |    coalesce(n_actual, 0) AS n_actual,
             |    coalesce(tp, 0) AS tp,
             |    coalesce(n_predicted, 0) AS n_predicted
             |  FROM ba FULL OUTER JOIN bp ON ba.cls = bp.cls
             |), m AS (
             |  SELECT cls, n_actual, tp, n_predicted,
             |    CASE WHEN n_predicted = 0 THEN 0
             |      ELSE (1000 * tp) // n_predicted END AS prec_pm,
             |    CASE WHEN n_actual = 0 THEN 0
             |      ELSE (1000 * tp) // n_actual END AS rec_pm
             |  FROM j
             |)
             |SELECT cls, n_actual, tp, n_predicted,
             |  CAST(prec_pm AS BIGINT) AS prec_pm,
             |  CAST(rec_pm AS BIGINT) AS rec_pm,
             |  CAST(CASE WHEN prec_pm + rec_pm = 0 THEN 0
             |    ELSE (2 * prec_pm * rec_pm) // (prec_pm + rec_pm)
             |    END AS BIGINT) AS f1_pm
             |FROM m""".stripMargin),
    ),

    // ---- one-way ANOVA F across lineitem line numbers
    // (ops/SeriesStats.oneWayAnovaF): exact per-group BIGINT
    // sufficient sums; the between-group Σ s_i²/n_i folds over the
    // sorted group axis in a pinned order that DuckDB replays with a
    // recursive CTE (the q260 convention), so F is bit-identical.
    // Quantity cents keep Σx² far inside BIGINT (50·100 cents max).
    Q(
      "q312_anova_f",
      (s, d) => SeriesStats.oneWayAnovaF(
        Tables.lineitem(s, d)
          .select(col("l_linenumber").as("grp"),
            expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100" +
              " AS BIGINT)").as("cents")),
        "grp", "cents"),
      Some("""WITH g AS (
             |  SELECT CAST(l_linenumber AS BIGINT) AS g,
             |    CAST(count(*) AS BIGINT) AS n_i,
             |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
             |      AS BIGINT)) AS BIGINT) AS s_i,
             |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
             |        AS BIGINT)
             |      * CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
             |        AS BIGINT)) AS BIGINT) AS q_i
             |  FROM lineitem GROUP BY 1
             |), ord AS (
             |  SELECT *, CAST(row_number() OVER (ORDER BY g) AS BIGINT)
             |    AS rn
             |  FROM g
             |), fold AS (
             |  WITH RECURSIVE f(rn, a) AS (
             |    SELECT CAST(0 AS BIGINT), CAST(0 AS DOUBLE)
             |    UNION ALL
             |    SELECT o.rn,
             |      f.a + CAST(o.s_i AS DOUBLE) * CAST(o.s_i AS DOUBLE)
             |        / o.n_i
             |    FROM f JOIN ord o ON o.rn = f.rn + 1
             |  ) SELECT a FROM f ORDER BY rn DESC LIMIT 1
             |), tot AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k,
             |    CAST(sum(n_i) AS BIGINT) AS n,
             |    CAST(sum(s_i) AS BIGINT) AS s,
             |    CAST(sum(q_i) AS BIGINT) AS q
             |  FROM g
             |)
             |SELECT k, n,
             |  (a - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / 10000.0
             |    AS ss_between,
             |  (CAST(q AS DOUBLE) - a) / 10000.0 AS ss_within,
             |  k - 1 AS df1, n - k AS df2,
             |  (((a - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
             |      / 10000.0) / (k - 1))
             |    / (((CAST(q AS DOUBLE) - a) / 10000.0) / (n - k))
             |    AS f_stat
             |FROM tot, fold
             |WHERE k >= 2 AND n > k""".stripMargin),
    ),

    // ---- exact ROC-AUC via the Mann–Whitney identity
    // (ops/RankStats.rocAucExact): tie-averaged doubled ranks keep
    // U⁺ exact BIGINT; AUC is one final division. The score is a
    // deterministic value-derived integer (no model needed to pin the
    // rank arithmetic); label = purchase events. The oracle restates
    // 2·avgrank as 2·rank() + count(*) OVER (PARTITION BY score) − 1.
    Q(
      "q313_roc_auc",
      (s, d) => RankStats.rocAucExact(
        Tables.events(s, d).select(
          (col("event_type") === "purchase").cast("long").as("y"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)" +
            " % 1000000").as("score"),
          col("event_id")),
        "y", "score", "event_id"),
      Some("""WITH s AS (
             |  SELECT event_id,
             |    CAST(event_type = 'purchase' AS BIGINT) AS y,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      % 1000000 AS sc
             |  FROM events
             |), r AS (
             |  SELECT y, 2 * rank() OVER (ORDER BY sc)
             |    + count(*) OVER (PARTITION BY sc) - 1 AS rx2
             |  FROM s
             |), agg AS (
             |  SELECT CAST(sum(y) AS BIGINT) AS n_pos,
             |    CAST(sum(1 - y) AS BIGINT) AS n_neg,
             |    CAST(sum(CASE WHEN y = 1 THEN rx2 END) AS BIGINT)
             |      AS r_x2_pos
             |  FROM r
             |)
             |SELECT n_pos, n_neg,
             |  r_x2_pos - n_pos * (n_pos + 1) AS u_x2,
             |  CAST(r_x2_pos - n_pos * (n_pos + 1) AS DOUBLE)
             |    / (2.0 * n_pos * n_neg) AS auc
             |FROM agg""".stripMargin),
    ),

    // ---- calibration reliability bins + Brier/ECE numerators
    // (ops/Scoring.calibrationBins): per-decile exact BIGINT sums over
    // a fixed-point score in [0, 1e6); every derived double is one
    // division over exact sums. A binning off-by-one (top edge), a
    // float mean, or a dropped empty-bin row all mismatch.
    Q(
      "q314_calibration_bins",
      (s, d) => Scoring.calibrationBins(
        Tables.events(s, d).select(
          expr("((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)" +
            " * 7919 % 1000000) + 1000000) % 1000000").as("score_micro"),
          (col("event_type") === "purchase").cast("long").as("y")),
        "score_micro", "y", bins = 10),
      Some("""WITH s AS (
             |  SELECT ((CAST(CAST(value AS DECIMAL(18,2)) * 100
             |        AS BIGINT) * 7919 % 1000000) + 1000000) % 1000000
             |      AS sc,
             |    CAST(event_type = 'purchase' AS BIGINT) AS y
             |  FROM events
             |), b AS (
             |  SELECT least((sc * 10) // 1000000, 9) AS bin, sc, y
             |  FROM s
             |)
             |SELECT CAST(bin AS BIGINT) AS bin,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(sc) AS BIGINT) AS sum_score_micro,
             |  CAST(sum(y) AS BIGINT) AS n_pos,
             |  CAST(sum(sc) AS DOUBLE) / count(*) / 1000000.0
             |    AS mean_pred,
             |  CAST(sum(y) AS DOUBLE) / count(*) AS frac_pos,
             |  CAST(abs(sum(sc) - sum(y) * 1000000) AS BIGINT)
             |    AS ece_gap_num,
             |  CAST(sum((sc - y * 1000000) * (sc - y * 1000000))
             |    AS BIGINT) AS brier_num
             |FROM b GROUP BY 1""".stripMargin),
    ),

    // ---- strict ordered funnel signup → click → purchase
    // (ops/Behavior.funnelSteps): step i counts only when its earliest
    // occurrence is STRICTLY after step i−1's reach time — per-user
    // one sorted aggregate() fold (the ewmaInt per-key shape). The
    // oracle restates the chain as min-ts CTEs with the same strict
    // inequality; an out-of-order credit, a non-strict boundary, or a
    // per-mille rounding drift all mismatch.
    Q(
      "q317_funnel_steps",
      (s, d) => Behavior.funnelSteps(Tables.events(s, d),
        "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase")),
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |    CAST(floor(epoch(ts) * 1000000) AS BIGINT) AS t
             |  FROM events
             |  WHERE event_type IN ('signup', 'click', 'purchase')
             |), t1 AS (
             |  SELECT user_id, min(t) AS r1 FROM e
             |  WHERE event_type = 'signup' GROUP BY 1
             |), t2 AS (
             |  SELECT e.user_id, min(e.t) AS r2
             |  FROM e JOIN t1 USING (user_id)
             |  WHERE e.event_type = 'click' AND e.t > t1.r1 GROUP BY 1
             |), t3 AS (
             |  SELECT e.user_id, min(e.t) AS r3
             |  FROM e JOIN t2 USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.t > t2.r2
             |  GROUP BY 1
             |), n AS (
             |  SELECT (SELECT count(*) FROM t1) AS n1,
             |    (SELECT count(*) FROM t2) AS n2,
             |    (SELECT count(*) FROM t3) AS n3
             |)
             |SELECT 1 AS step_idx, 'signup' AS step,
             |  CAST(n1 AS BIGINT) AS n_reached,
             |  CAST(1000 AS BIGINT) AS conv_from_prev_pm,
             |  CAST(CASE WHEN n1 = 0 THEN 0 ELSE 1000 END AS BIGINT)
             |    AS conv_from_first_pm
             |FROM n
             |UNION ALL
             |SELECT 2, 'click', CAST(n2 AS BIGINT),
             |  CAST(CASE WHEN n1 = 0 THEN 0
             |    ELSE (1000 * n2) // n1 END AS BIGINT),
             |  CAST(CASE WHEN n1 = 0 THEN 0
             |    ELSE (1000 * n2) // n1 END AS BIGINT)
             |FROM n
             |UNION ALL
             |SELECT 3, 'purchase', CAST(n3 AS BIGINT),
             |  CAST(CASE WHEN n2 = 0 THEN 0
             |    ELSE (1000 * n3) // n2 END AS BIGINT),
             |  CAST(CASE WHEN n1 = 0 THEN 0
             |    ELSE (1000 * n3) // n1 END AS BIGINT)
             |FROM n""".stripMargin),
    ),

    // ---- weekly cohort retention matrix (ops/Behavior.cohortRetention):
    // cohort = first-activity epoch-week, one distinct + two hash
    // aggregations, all-BIGINT matrix with per-mille retention. The
    // floor-then-cast epoch arithmetic is pinned on both engines
    // (Spark's double→long cast truncates, DuckDB's rounds).
    Q(
      "q318_cohort_retention",
      (s, d) => Behavior.cohortRetention(Tables.events(s, d),
        "user_id", "ts", periodDays = 7),
      Some("""WITH a AS (
             |  SELECT DISTINCT user_id,
             |    CAST(floor(epoch(ts) / 86400) AS BIGINT) // 7 AS p
             |  FROM events
             |), f AS (
             |  SELECT user_id, min(p) AS c FROM a GROUP BY 1
             |), m AS (
             |  SELECT f.c AS cohort_period, a.p - f.c AS period_offset,
             |    CAST(count(*) AS BIGINT) AS n_active
             |  FROM a JOIN f USING (user_id) GROUP BY 1, 2
             |), sz AS (
             |  SELECT c AS cohort_period,
             |    CAST(count(*) AS BIGINT) AS cohort_size
             |  FROM f GROUP BY 1
             |)
             |SELECT m.cohort_period, m.period_offset, m.n_active,
             |  sz.cohort_size,
             |  CAST((1000 * m.n_active) // sz.cohort_size AS BIGINT)
             |    AS retention_pm
             |FROM m JOIN sz USING (cohort_period)""".stripMargin),
    ),

    // ---- Wald SPRT over the daily purchase-rate stream
    // (ops/SeriesStats.sprtBernoulli): H0 p=0.2 vs H1 p=0.3,
    // α = β = 0.05. Increments and Wald bounds are micro-nat FLOORS
    // from StrictMath.log (fdlibm — bit-identical on every JVM), so
    // the oracle embeds the same four integers as literals (405465,
    // −133532, +2944438, −2944439 — pinned against sprtConstants in
    // InferenceStatsSpec) and the BIGINT walk, every crossing, and the
    // first-decision day restate exactly.
    Q(
      "q319_sprt",
      (s, d) => SeriesStats.sprtBernoulli(
        Tables.events(s, d)
          .select(datediff(to_date(col("ts")), lit("1970-01-01"))
            .as("day"), (col("event_type") === "purchase").as("succ")),
        "day", "succ", p0Pm = 200, p1Pm = 300),
      Some("""WITH e AS (
             |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS t,
             |    CAST(event_type = 'purchase' AS BIGINT) AS s
             |  FROM events
             |), dd AS (
             |  SELECT t, CAST(count(*) AS BIGINT) AS n_trials,
             |    CAST(sum(s) AS BIGINT) AS n_success
             |  FROM e GROUP BY 1
             |), wlk AS (
             |  SELECT t, n_trials, n_success,
             |    CAST(sum(n_success * 405465
             |        + (n_trials - n_success) * -133532)
             |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS llr_cum_micro
             |  FROM dd
             |), c AS (
             |  SELECT *, CASE WHEN llr_cum_micro >= 2944438 THEN 'h1'
             |    WHEN llr_cum_micro <= -2944439 THEN 'h0'
             |    END AS crossed
             |  FROM wlk
             |), f AS (
             |  SELECT min(t) AS dt FROM c WHERE crossed IS NOT NULL
             |)
             |SELECT t, n_trials, n_success, llr_cum_micro, crossed,
             |  (dt IS NOT NULL AND t = dt) AS is_decision
             |FROM c, f""".stripMargin),
    ),

    // ---- Simpson's-paradox reversal audit over purchase rates
    // (ops/Scoring.simpsonsReversal): strata = epoch-day-of-week,
    // sides = user-id parity, all comparisons integer
    // cross-multiplications (never rate divisions) — per-stratum
    // directions plus the pooled verdict row. The oracle restates
    // every sign and the consensus rule; a division-based rate, a
    // dropped zero-direction stratum, or a wrong consensus all flip
    // rows.
    Q(
      "q322_simpsons_audit",
      (s, d) => Scoring.simpsonsReversal(
        Tables.events(s, d).select(
          expr("CAST(floor(CAST(ts AS DOUBLE) / 86400) AS BIGINT) % 7")
            .as("dow"),
          (col("user_id") % 2 === 1).as("side"),
          (col("event_type") === "purchase").as("succ")),
        "dow", "side", "succ"),
      Some("""WITH e AS (
             |  SELECT CAST(CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7
             |      AS VARCHAR) AS stratum,
             |    user_id % 2 = 1 AS side,
             |    event_type = 'purchase' AS succ
             |  FROM events
             |), per AS (
             |  SELECT stratum,
             |    CAST(count(*) FILTER (WHERE NOT side) AS BIGINT) AS n_a,
             |    CAST(coalesce(sum(CASE WHEN NOT side AND succ
             |      THEN 1 END), 0) AS BIGINT) AS s_a,
             |    CAST(count(*) FILTER (WHERE side) AS BIGINT) AS n_b,
             |    CAST(coalesce(sum(CASE WHEN side AND succ
             |      THEN 1 END), 0) AS BIGINT) AS s_b
             |  FROM e GROUP BY 1
             |), per2 AS (
             |  SELECT stratum, n_a, s_a, n_b, s_b,
             |    CAST(s_a * n_b - s_b * n_a AS BIGINT) AS cross_diff,
             |    CAST(CASE WHEN s_a * n_b - s_b * n_a > 0 THEN 1
             |      WHEN s_a * n_b - s_b * n_a < 0 THEN -1 ELSE 0
             |      END AS BIGINT) AS direction,
             |    false AS reversed
             |  FROM per
             |), pool AS (
             |  SELECT CAST(sum(n_a) AS BIGINT) AS n_a,
             |    CAST(sum(s_a) AS BIGINT) AS s_a,
             |    CAST(sum(n_b) AS BIGINT) AS n_b,
             |    CAST(sum(s_b) AS BIGINT) AS s_b,
             |    min(CASE WHEN direction <> 0 THEN direction END)
             |      AS dmin,
             |    max(CASE WHEN direction <> 0 THEN direction END)
             |      AS dmax
             |  FROM per2
             |), poolrow AS (
             |  SELECT '__pooled__' AS stratum, n_a, s_a, n_b, s_b,
             |    CAST(s_a * n_b - s_b * n_a AS BIGINT) AS cross_diff,
             |    CAST(CASE WHEN s_a * n_b - s_b * n_a > 0 THEN 1
             |      WHEN s_a * n_b - s_b * n_a < 0 THEN -1 ELSE 0
             |      END AS BIGINT) AS direction,
             |    (dmin IS NOT NULL AND dmin = dmax
             |     AND CASE WHEN s_a * n_b - s_b * n_a > 0 THEN 1
             |       WHEN s_a * n_b - s_b * n_a < 0 THEN -1 ELSE 0 END
             |       <> 0
             |     AND CASE WHEN s_a * n_b - s_b * n_a > 0 THEN 1
             |       WHEN s_a * n_b - s_b * n_a < 0 THEN -1 ELSE 0 END
             |       = -dmin) AS reversed
             |  FROM pool
             |)
             |SELECT stratum, n_a, s_a, n_b, s_b, cross_diff,
             |  direction, reversed
             |FROM per2
             |UNION ALL
             |SELECT * FROM poolrow""".stripMargin),
    ),

    // ---- the UNBOUNDED-axis SPRT (ops/SeriesStats.sprtBernoulliScan):
    // the same Wald walk as q319 but the cumulative log-likelihood sum
    // rides the PrefixScan two-pass shape instead of a single-partition
    // window — the 100-TB path when the time axis itself is unbounded.
    // Probe stream = daily CLICK rate (base ~0.2, so the walk drifts
    // to h0 where q319's purchase walk tests the same hypotheses on
    // its own data); constants are the identical pinned micro-nat
    // floors (405465, −133532, +2944438, −2944439). The oracle is one
    // cumulative window — in DuckDB the axis is bounded; the Spark
    // side is what distributes.
    Q(
      "q326_sprt_scan",
      (s, d) => SeriesStats.sprtBernoulliScan(
        Tables.events(s, d)
          .select(datediff(to_date(col("ts")), lit("1970-01-01"))
            .as("day"), (col("event_type") === "click").as("succ")),
        "day", "succ", p0Pm = 200, p1Pm = 300),
      Some("""WITH e AS (
             |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS t,
             |    CAST(event_type = 'click' AS BIGINT) AS s
             |  FROM events
             |), dd AS (
             |  SELECT t, CAST(count(*) AS BIGINT) AS n_trials,
             |    CAST(sum(s) AS BIGINT) AS n_success
             |  FROM e GROUP BY 1
             |), wlk AS (
             |  SELECT t, n_trials, n_success,
             |    CAST(sum(n_success * 405465
             |        + (n_trials - n_success) * -133532)
             |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS llr_cum_micro
             |  FROM dd
             |), c AS (
             |  SELECT *, CASE WHEN llr_cum_micro >= 2944438 THEN 'h1'
             |    WHEN llr_cum_micro <= -2944439 THEN 'h0'
             |    END AS crossed
             |  FROM wlk
             |), f AS (
             |  SELECT min(t) AS dt FROM c WHERE crossed IS NOT NULL
             |)
             |SELECT t, n_trials, n_success, llr_cum_micro, crossed,
             |  (dt IS NOT NULL AND t = dt) AS is_decision
             |FROM c, f""".stripMargin),
    ),
  )
}
