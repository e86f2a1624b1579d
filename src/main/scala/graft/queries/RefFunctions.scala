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

    // ---- F4/F10/F11/F12/F21 on constructed labels, both branches each:
    // all-of-3 address vs empty, nbsp-thousands summary, gallery rewrite
    // (hit + miss), updated-label strip, walking-time extract (hit + miss).
    Q(
      "q39_label_functions",
      (s, d) => {
        import s.implicits._
        val ck = col("c_custkey")
        def n(c: org.apache.spark.sql.Column) = c.cast("string")
        val nSum = ck + 1000
        val summaryLabel = concat(lit("Найдено "), n(floor(nSum / 1000)),
          lit(" "), lpad(n(pmod(nSum, lit(1000))), 3, "0"),
          lit(" объявлений"))
        val imgs = array(
          concat(lit("https://images.cdn-cian.ru/img/"), n(ck), lit("-4.jpg")),
          concat(lit("https://images.cdn-cian.ru/img/"), n(ck), lit("-2.jpg")))
        Tables.customer(s, d).select(
          ck.as("c_custkey"),
          Functions.buildAddress(
            when(pmod(ck, lit(5)) === 0, lit("")).otherwise(lit("Москва")),
            col("c_name"), n(pmod(ck, lit(50)) + 1)).as("address"),
          Functions.summaryCount(summaryLabel).as("summary"),
          element_at(Functions.upgradeImageUrls(imgs), 1).as("img1"),
          element_at(Functions.upgradeImageUrls(imgs), 2).as("img2"),
          Functions.stripUpdatedLabel(
            concat(lit("Обновлено: "), n(pmod(ck, lit(28)) + 1), lit(" мая")))
            .as("updated_label"),
          Functions.walkingTime(
            when(pmod(ck, lit(10)) === 0, lit("далеко от метро"))
              .otherwise(concat(n(pmod(ck, lit(30)) + 1), lit(" мин. пешком"))))
            .as("walking_time"))
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN c_custkey % 5 = 0 THEN ''
             |       ELSE 'Москва, ' || c_name || ', ' || CAST(c_custkey % 50 + 1 AS VARCHAR) END AS address,
             |  CAST(c_custkey + 1000 AS BIGINT) AS summary,
             |  'https://images.cdn-cian.ru/img/' || CAST(c_custkey AS VARCHAR) || '-1.jpg' AS img1,
             |  'https://images.cdn-cian.ru/img/' || CAST(c_custkey AS VARCHAR) || '-2.jpg' AS img2,
             |  CAST(c_custkey % 28 + 1 AS VARCHAR) || ' мая' AS updated_label,
             |  CASE WHEN c_custkey % 10 = 0 THEN NULL
             |       ELSE CAST(c_custkey % 30 + 1 AS VARCHAR) || ' мин.' END AS walking_time
             |FROM customer""".stripMargin),
    ),

    // ---- F6/F7/F19/F20 on constructed labels, both branches each:
    // 3-number studio title vs 4-number title (positional extraction),
    // exactly-3 stats vs no-stats, JS smart-split (comma-in-decimal not a
    // separator), and the four keyword normalizers.
    Q(
      "q40_title_keyword_functions",
      (s, d) => {
        import s.implicits._
        val ck = col("c_custkey")
        def n(c: org.apache.spark.sql.Column) = c.cast("string")
        val even = pmod(ck, lit(2)) === 0
        val r = n(pmod(ck, lit(4)) + 1)
        val a = n(pmod(ck, lit(80)) + 20)
        val f = n(pmod(ck, lit(9)) + 1)
        val title = when(even,
          concat(lit("Квартира-студия, "), a, lit(" м², "), f,
            lit("/12 этаж")))
          .otherwise(concat(r, lit("-комн. квартира, "), a,
            lit(",5 м², "), f, lit("/12 этаж")))
        val stats = when(even,
          concat(n(ck * 2), lit(" просмотров, "), n(pmod(ck, lit(9))),
            lit(" за сегодня, "), n(ck), lit(" уникальных")))
          .otherwise(lit("нет данных"))
        val t6 = Functions.parseOfferTitle(title)
        val t7 = Functions.parseOfferStats(stats)
        val t19 = Functions.titleSmartSplit(title)
        Tables.customer(s, d).select(
          ck.as("c_custkey"),
          t6.getField("room_count").as("room_count"),
          t6.getField("total_area").as("f6_area"),
          t6.getField("floor").as("f6_floor"),
          t6.getField("total_floors").as("f6_total"),
          t7.getField("total_views").as("total_views"),
          t7.getField("today_views").as("today_views"),
          t7.getField("unique_views").as("unique_views"),
          t19.getField("total_area").as("split_area"),
          t19.getField("floor_combined").as("split_floor"),
          Functions.normalizeRentalPeriod(
            when(even, lit("На длительный срок")).otherwise(lit("Посуточно")))
            .as("rental_period"),
          Functions.normalizeUtilities(
            when(even, lit("Комм. платежи включены"))
              .otherwise(lit("Комм. платежи не включены")))
            .as("utilities_payment"),
          Functions.normalizeCommission(
            when(even, lit("Без комиссии")).otherwise(lit("Комиссия 50%")))
            .as("commission"),
          Functions.normalizeDeposit(
            when(even, lit("Без залога")).otherwise(lit("Залог 30000 ₽")))
            .as("security_deposit"))
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN c_custkey % 2 = 0 THEN '0'
             |       ELSE CAST(c_custkey % 4 + 1 AS VARCHAR) END AS room_count,
             |  CASE WHEN c_custkey % 2 = 0 THEN CAST(c_custkey % 80 + 20 AS VARCHAR)
             |       ELSE CAST(c_custkey % 80 + 20 AS VARCHAR) || '.5' END AS f6_area,
             |  CAST(c_custkey % 9 + 1 AS VARCHAR) AS f6_floor,
             |  '12' AS f6_total,
             |  CASE WHEN c_custkey % 2 = 0 THEN CAST(c_custkey * 2 AS VARCHAR) END AS total_views,
             |  CASE WHEN c_custkey % 2 = 0 THEN CAST(c_custkey % 9 AS VARCHAR) END AS today_views,
             |  CASE WHEN c_custkey % 2 = 0 THEN CAST(c_custkey AS VARCHAR) END AS unique_views,
             |  CASE WHEN c_custkey % 2 = 0 THEN CAST(c_custkey % 80 + 20 AS VARCHAR) || ' м²'
             |       ELSE CAST(c_custkey % 80 + 20 AS VARCHAR) || ',5 м²' END AS split_area,
             |  CAST(c_custkey % 9 + 1 AS VARCHAR) || ' из 12' AS split_floor,
             |  CASE WHEN c_custkey % 2 = 0 THEN 'длительный срок'
             |       ELSE 'посуточно' END AS rental_period,
             |  CASE WHEN c_custkey % 2 = 0 THEN 'включена'
             |       ELSE 'не включена' END AS utilities_payment,
             |  CASE WHEN c_custkey % 2 = 0 THEN 'нет' ELSE '50%' END AS commission,
             |  CASE WHEN c_custkey % 2 = 0 THEN 'нет' ELSE '30000 ₽' END AS security_deposit
             |FROM customer""".stripMargin),
    ),
  )
}
