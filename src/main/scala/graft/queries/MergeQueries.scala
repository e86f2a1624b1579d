package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Tables
import graft.merge.MergeListings

/** Oracle-checked exercise of the MERGE centerpiece (SURVEY §2 J1 +
  * R1–R9): every event becomes a source row for its user key, folded in
  * event_id order through the real `MergeListings.mergeBatch` — inserts,
  * last-wins updates, and the full price-CDC family (change count, last
  * delta, comma-joined histories) — then checked against a DuckDB
  * window-function restatement.
  */
object MergeQueries extends QueryModule {

  val queries: Seq[Q] = Seq(
    Q(
      "q19_merge_upsert_cdc",
      (s, d) => {
        val src = Tables.events(s, d).select(
          col("user_id").cast(StringType).as("offer_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("updated_date"),
          col("value").as("price_value"),
          col("event_id"))
        val emptyTarget = s.createDataFrame(
          s.sparkContext.emptyRDD[Row],
          StructType(Seq(
            StructField("offer_id", StringType),
            StructField("updated_date", StringType),
            StructField("price_value", DoubleType))))
        MergeListings.mergeBatch(emptyTarget, src, Some("event_id"))
          .select(
            col("offer_id").cast(LongType).as("user_id"),
            col("price_value"),
            col("publication_date"),
            col("last_active"),
            col("total_price_changes"),
            col("price_change_value"),
            col("price_change_date"),
            col("price_changes"),
            col("price_changes_dates"))
      },
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, value,
             |    strftime(ts, '%Y-%m-%d %H:%M:%S') AS tss,
             |    lag(value) OVER w AS prev_value
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
             |), changes AS (
             |  SELECT user_id, event_id, tss,
             |    CAST(trunc(value) AS BIGINT) - CAST(trunc(prev_value) AS BIGINT) AS delta
             |  FROM ordered WHERE prev_value IS NOT NULL AND value <> prev_value
             |), per_user AS (
             |  SELECT user_id,
             |    max_by(value, event_id) AS price_value,
             |    min_by(tss, event_id) AS publication_date,
             |    max_by(tss, event_id) AS last_active
             |  FROM ordered GROUP BY user_id
             |), cdc AS (
             |  SELECT user_id,
             |    count(*) AS total_price_changes,
             |    max_by(delta, event_id) AS price_change_value,
             |    max_by(tss, event_id) AS price_change_date,
             |    string_agg(CAST(delta AS VARCHAR), ', ' ORDER BY event_id) AS price_changes,
             |    string_agg(tss, ', ' ORDER BY event_id) AS price_changes_dates
             |  FROM changes GROUP BY user_id
             |)
             |SELECT p.user_id, p.price_value, p.publication_date, p.last_active,
             |  c.total_price_changes, c.price_change_value, c.price_change_date,
             |  c.price_changes, c.price_changes_dates
             |FROM per_user p LEFT JOIN cdc c ON p.user_id = c.user_id""".stripMargin),
    ),

    // ---- The MATCHED-row merge path (R1/R2/R4/R5/R6/R7 cross-batch,
    // merge.py:29-94): events split by event_id parity into two batches;
    // batch 1 folds into an empty master, batch 2 folds into THAT — so
    // every batch-2 row for a batch-1 user exercises the update branch
    // against a real target row. Cross-batch == one fold in (parity,
    // event_id) order, which DuckDB restates with window functions.
    // is_unpublished (event_type='error') drives the R4 unpublish
    // transition; description exercises the R7 freeze-while-unpublished.
    Q(
      "q38_merge_two_batch",
      (s, d) => {
        val ev = Tables.events(s, d).select(
          col("user_id").cast(StringType).as("offer_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("updated_date"),
          col("value").as("price_value"),
          (col("event_type") === "error").as("is_unpublished"),
          concat(lit("d-"), col("event_id").cast("string")).as("description"),
          col("event_id"))
        val batch1 = ev.filter(col("event_id") % 2 === 0)
        val batch2 = ev.filter(col("event_id") % 2 === 1)
        val emptyTarget = s.createDataFrame(
          s.sparkContext.emptyRDD[Row],
          StructType(Seq(
            StructField("offer_id", StringType),
            StructField("updated_date", StringType),
            StructField("price_value", DoubleType),
            StructField("is_unpublished", BooleanType),
            StructField("description", StringType))))
        val m1 = MergeListings.mergeBatch(emptyTarget, batch1, Some("event_id"))
        val m2 = MergeListings.mergeBatch(m1, batch2, Some("event_id"))
        m2.select(
          col("offer_id").cast(LongType).as("user_id"),
          col("price_value"),
          col("publication_date"),
          col("last_active"),
          col("is_unpublished"),
          col("unpublished_date"),
          col("description"),
          col("total_price_changes"),
          col("price_change_value"),
          col("price_change_date"),
          col("price_changes"),
          col("price_changes_dates"))
      },
      Some("""WITH src AS (
             |  SELECT user_id, event_id, value,
             |    strftime(ts, '%Y-%m-%d %H:%M:%S') AS tss,
             |    (event_type = 'error') AS unpub,
             |    'd-' || CAST(event_id AS VARCHAR) AS descr,
             |    event_id % 2 AS batch
             |  FROM events
             |), ordered AS (
             |  SELECT *, row_number() OVER w AS rn,
             |    lag(value) OVER w AS prev_value,
             |    lag(unpub) OVER w AS prev_unpub
             |  FROM src WINDOW w AS (PARTITION BY user_id ORDER BY batch, event_id)
             |), flags AS (
             |  SELECT *,
             |    (rn > 1 AND unpub AND NOT prev_unpub) AS transition,
             |    (rn > 1 AND NOT (unpub AND NOT prev_unpub)
             |       AND value <> prev_value) AS price_changed,
             |    CAST(trunc(value) AS BIGINT) - CAST(trunc(prev_value) AS BIGINT) AS delta
             |  FROM ordered
             |), per_user AS (
             |  SELECT user_id,
             |    max_by(value, rn) AS price_value,
             |    min_by(tss, rn) AS publication_date,
             |    max_by(tss, rn) AS last_active,
             |    max_by(unpub, rn) AS is_unpublished,
             |    max_by(tss, rn) FILTER (WHERE transition) AS unpublished_date,
             |    max_by(descr, rn) FILTER (WHERE NOT unpub OR rn = 1) AS description
             |  FROM flags GROUP BY user_id
             |), cdc AS (
             |  SELECT user_id,
             |    count(*) AS total_price_changes,
             |    max_by(delta, rn) AS price_change_value,
             |    max_by(tss, rn) AS price_change_date,
             |    string_agg(CAST(delta AS VARCHAR), ', ' ORDER BY rn) AS price_changes,
             |    string_agg(tss, ', ' ORDER BY rn) AS price_changes_dates
             |  FROM flags WHERE price_changed GROUP BY user_id
             |)
             |SELECT p.user_id, p.price_value, p.publication_date, p.last_active,
             |  p.is_unpublished, p.unpublished_date, p.description,
             |  c.total_price_changes, c.price_change_value, c.price_change_date,
             |  c.price_changes, c.price_changes_dates
             |FROM per_user p LEFT JOIN cdc c ON p.user_id = c.user_id""".stripMargin),
    ),

    // ---- J2 url-fallback join (merge.py:13-18): batch 1 builds a keyed
    // master carrying offer_url; batch 2 is all ORPHANS (null offer_id,
    // matching offer_url) — each must adopt the master row's key and
    // land as an unpublish update (is_unpublished forced true, R4
    // transition when the prior state was active, R7 description freeze,
    // null price skipped by R1). DuckDB restates the whole two-batch
    // fold with the orphan unioned in as a synthetic last row per user.
    Q(
      "q48_merge_url_fallback",
      (s, d) => {
        val ev = Tables.events(s, d).filter(col("event_id") % 2 === 0).select(
          col("user_id").cast(StringType).as("offer_id"),
          concat(lit("https://cian.ru/rent/flat/"),
            col("user_id").cast("string"), lit("/")).as("offer_url"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("updated_date"),
          col("value").as("price_value"),
          (col("event_type") === "error").as("is_unpublished"),
          concat(lit("d-"), col("event_id").cast("string")).as("description"),
          col("event_id"))
        val orphans = ev.select(col("offer_url")).distinct().select(
          lit(null).cast(StringType).as("offer_id"),
          col("offer_url"),
          lit("2026-01-01 00:00:00").as("updated_date"),
          lit(null).cast(DoubleType).as("price_value"),
          lit(null).cast(BooleanType).as("is_unpublished"),
          lit(null).cast(StringType).as("description"),
          lit(1000000000L).as("event_id"))
        val emptyTarget = s.createDataFrame(
          s.sparkContext.emptyRDD[Row],
          StructType(Seq(
            StructField("offer_id", StringType),
            StructField("offer_url", StringType),
            StructField("updated_date", StringType),
            StructField("price_value", DoubleType),
            StructField("is_unpublished", BooleanType),
            StructField("description", StringType))))
        // the J2 path reads the target twice (url-lookup + main join); a
        // real master is a published table between batches — materialize
        // m1 to mirror that instead of executing the batch-1 fold twice.
        // localCheckpoint (not persist): blocks free on GC, no session-
        // lifetime cache pin, and the batch-2 plan starts from a flat
        // scan instead of re-optimizing the whole batch-1 fold
        val m1 = MergeListings.mergeBatch(emptyTarget, ev, Some("event_id"))
          .localCheckpoint()
        val m2 = MergeListings.mergeBatch(m1, orphans, Some("event_id"))
        m2.select(
          col("offer_id").cast(LongType).as("user_id"),
          col("offer_url"),
          col("price_value"),
          col("publication_date"),
          col("last_active"),
          col("is_unpublished"),
          col("unpublished_date"),
          col("description"),
          col("total_price_changes"),
          col("price_changes"))
      },
      Some("""WITH src AS (
             |  SELECT user_id, event_id, value,
             |    strftime(ts, '%Y-%m-%d %H:%M:%S') AS tss,
             |    (event_type = 'error') AS unpub,
             |    'd-' || CAST(event_id AS VARCHAR) AS descr
             |  FROM events WHERE event_id % 2 = 0
             |), uni AS (
             |  SELECT * FROM src
             |  UNION ALL
             |  SELECT DISTINCT user_id, 1000000000 AS event_id,
             |    CAST(NULL AS DOUBLE) AS value, '2026-01-01 00:00:00' AS tss,
             |    TRUE AS unpub, CAST(NULL AS VARCHAR) AS descr
             |  FROM src
             |), ordered AS (
             |  SELECT *, row_number() OVER w AS rn,
             |    lag(value) OVER w AS prev_value,
             |    lag(unpub) OVER w AS prev_unpub
             |  FROM uni WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
             |), flags AS (
             |  SELECT *,
             |    (rn > 1 AND unpub AND NOT prev_unpub) AS transition,
             |    (rn > 1 AND NOT (unpub AND NOT prev_unpub)
             |       AND value IS NOT NULL AND prev_value IS NOT NULL
             |       AND value <> prev_value) AS price_changed,
             |    CAST(trunc(value) AS BIGINT) - CAST(trunc(prev_value) AS BIGINT) AS delta
             |  FROM ordered
             |), per_user AS (
             |  SELECT user_id,
             |    max_by(value, rn) FILTER (WHERE value IS NOT NULL) AS price_value,
             |    min_by(tss, rn) AS publication_date,
             |    max_by(tss, rn) AS last_active,
             |    max_by(unpub, rn) AS is_unpublished,
             |    max_by(tss, rn) FILTER (WHERE transition) AS unpublished_date,
             |    max_by(descr, rn) FILTER (WHERE NOT unpub OR rn = 1) AS description
             |  FROM flags GROUP BY user_id
             |), cdc AS (
             |  SELECT user_id,
             |    count(*) AS total_price_changes,
             |    string_agg(CAST(delta AS VARCHAR), ', ' ORDER BY rn) AS price_changes
             |  FROM flags WHERE price_changed GROUP BY user_id
             |)
             |SELECT p.user_id,
             |  'https://cian.ru/rent/flat/' || CAST(p.user_id AS VARCHAR) || '/' AS offer_url,
             |  p.price_value, p.publication_date, p.last_active,
             |  p.is_unpublished, p.unpublished_date, p.description,
             |  c.total_price_changes, c.price_changes
             |FROM per_user p LEFT JOIN cdc c ON p.user_id = c.user_id""".stripMargin),
    ),

    // ---- J5 enrichment join: master ⋈ small enrichment frame, non-null
    // enrichment wins (distance.py:75-90 shape). The enrichment side is
    // tiny → broadcast; master never shuffles.
    Q(
      "q20_enrichment_join",
      (s, d) => {
        val master = Tables.customer(s, d)
        val enrichment = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("ltv"))
        master.join(broadcast(enrichment),
            col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_name"),
            // Exact decimal internally; DOUBLE only at the output boundary
            // (Spark sum→decimal(28,2) vs DuckDB decimal(38,2) render
            // differently; the values are identical).
            coalesce(col("ltv"), lit(0).cast("decimal(28,2)"))
              .cast("double").as("ltv"))
      },
      Some("""SELECT c_custkey, c_name,
             |  CAST(coalesce(e.ltv, 0) AS DOUBLE) AS ltv
             |FROM customer LEFT JOIN (
             |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS ltv
             |  FROM orders GROUP BY o_custkey) e ON c_custkey = e.o_custkey""".stripMargin),
    ),

    // ---- Sessionization: gap-based sessions (30 min idle) per user via
    // lag + running session counter — one window shuffle, the canonical
    // large-scale clickstream operator (batch twin of streaming
    // session windows).
    Q(
      "q32_sessionize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val ev = Tables.events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              col("ts").cast("long") - col("prev_ts").cast("long") > 1800,
              lit(1)).otherwise(lit(0)))
          .withColumn("session_id",
            sum(col("new_session")).over(
              byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        ev.groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss")
              .as("session_start"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss")
              .as("session_end"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("session_value"))
      },
      Some("""WITH marked AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |              OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), sessions AS (
             |  SELECT *, CAST(sum(new_session) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM marked
             |)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
             |FROM sessions GROUP BY user_id, session_id""".stripMargin),
    ),
  )
}
