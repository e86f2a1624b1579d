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
  )
}
