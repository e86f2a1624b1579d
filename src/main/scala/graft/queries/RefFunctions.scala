package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.functions.Functions

/** Oracle-checked exercises of the reference scalar-function family
  * (SURVEY §2 F1–F21) over the synthetic tables. Input labels are
  * CONSTRUCTED from table columns (the word-soup `documents` text has no
  * numerics/dates), so DuckDB can compute the same expected output and
  * the driver's hash compare validates the semantics end-to-end.
  */
object RefFunctions extends QueryModule {

  val queries: Seq[Q] = Seq(

    // ---- F1 parse_numeric_value round-trip: format a price label, parse
    // it back. Whole expression stays in whole-stage codegen (regex only).
    Q(
      "q15_parse_numeric",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .withColumn("label",
            concat($"o_totalprice".cast("string"), lit(" ₽/мес.")))
          .select($"o_orderkey",
            Functions.parseNumeric($"label").as("price_value"))
      },
      Some("""SELECT o_orderkey,
             |  CAST(regexp_extract(
             |    regexp_replace(replace(concat(CAST(o_totalprice AS VARCHAR), ' ₽/мес.'), ',', '.'), '\s+', '', 'g'),
             |    '(-?\d+(?:\.\d+)?)', 1) AS DOUBLE) AS price_value
             |FROM orders""".stripMargin),
    ),

    // ---- F2 parse_russian_date: per-row labels cycle through the three
    // formats; asOf pinned inside January so "20 янв" AFTER the 15th
    // exercises the year-rollback branch (normalize.py:83-85).
    Q(
      "q16_russian_date",
      (s, d) => {
        import s.implicits._
        val asOf = lit("2024-01-15 12:00:00").cast("timestamp")
        val hm = date_format($"ts", "HH:mm")
        val label = when($"event_id" % 3 === 0, concat(lit("сегодня "), hm))
          .when($"event_id" % 3 === 1, concat(lit("вчера "), hm))
          .otherwise(concat(dayofmonth($"ts").cast("string"),
            lit(" янв "), hm))
        Tables.events(s, d)
          .withColumn("label", label)
          .select($"event_id",
            Functions.parseRussianDate($"label", asOf).as("parsed_date"))
      },
      Some("""SELECT event_id,
             |  CASE event_id % 3
             |    WHEN 0 THEN '2024-01-15 ' || strftime(ts, '%H:%M') || ':00'
             |    WHEN 1 THEN '2024-01-14 ' || strftime(ts, '%H:%M') || ':00'
             |    ELSE strftime(make_timestamp(
             |      CASE WHEN make_timestamp(2024, 1, day(ts), hour(ts), minute(ts), 0)
             |                > TIMESTAMP '2024-01-15 12:00:00'
             |           THEN 2023 ELSE 2024 END,
             |      1, day(ts), hour(ts), minute(ts), 0), '%Y-%m-%d %H:%M:%S')
             |  END AS parsed_date
             |FROM events""".stripMargin),
    ),

    // ---- F3/F13 street + metro normalization on constructed labels.
    Q(
      "q17_street_metro_normalize",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .withColumn("street_label", concat($"c_name", lit(" улица")))
          .withColumn("metro_label", concat(lit("м. "), $"c_name"))
          .select($"c_custkey",
            Functions.normalizeStreetNames($"street_label").as("street"),
            Functions.stripMetroPrefix($"metro_label").as("metro_station"))
      },
      Some("""SELECT c_custkey,
             |  replace(c_name || ' улица', 'улица', 'ул.') AS street,
             |  c_name AS metro_station
             |FROM customer""".stripMargin),
    ),

    // ---- F5/F9/F16/F17 positional extracts + math in one pass.
    Q(
      "q18_struct_extracts",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .withColumn("floor_label",
            concat($"l_linenumber".cast("string"), lit(" из 12")))
          .withColumn("url",
            concat(lit("https://cian.ru/rent/flat/"),
              $"l_orderkey".cast("string"), lit("/")))
          .select(
            $"l_orderkey", $"l_linenumber",
            Functions.parseFloor($"floor_label").getField("floor").as("floor"),
            Functions.parseFloor($"floor_label").getField("total_floors")
              .as("total_floors"),
            Functions.offerIdFromUrl($"url").as("offer_id"),
            Functions.distanceKm($"l_extendedprice").as("distance_km"),
            Functions.totalPages($"l_quantity").as("total_pages"),
          )
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(regexp_extract(CAST(l_linenumber AS VARCHAR) || ' из 12', '(\d+)\s*из\s*(\d+)', 1) AS BIGINT) AS floor,
             |  CAST(regexp_extract(CAST(l_linenumber AS VARCHAR) || ' из 12', '(\d+)\s*из\s*(\d+)', 2) AS BIGINT) AS total_floors,
             |  regexp_extract('https://cian.ru/rent/flat/' || CAST(l_orderkey AS VARCHAR) || '/', '/rent/flat/(\d+)', 1) AS offer_id,
             |  floor(l_extendedprice / 1000 * 100 + 0.5) / 100 AS distance_km,
             |  CAST(ceil(l_quantity / 28) AS BIGINT) AS total_pages
             |FROM lineitem""".stripMargin),
    ),
  )
}
