package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Functions

/** B1/B2 flatten stage: promote the open-vocabulary `attrs` bag and the
  * parser's struct/array fields into the canonical flat listing schema
  * (reference data_process/flatten.py:4-71 + parse-time flattening).
  *
  * Collision rule (matches the reference's dict insertion-order
  * last-wins): positional PriceInfo fields beat the label bag for the
  * rental-term columns; the label bag beats title-derived values for
  * areas/floors. Unknown bag keys stay in `extras` (SURVEY §1.3 —
  * reproduces "unknown keys pass through" without schema drift).
  */
object Flatten {

  /** Russian/alias label → canonical column (flatten.py:4-55). */
  val fieldMappings: Map[String, String] = Map(
    "Залог" -> "security_deposit", "deposit" -> "security_deposit",
    "Комиссии" -> "commission", "Комиссия" -> "commission",
    "Оплата ЖКХ" -> "utilities_payment",
    "Предоплата" -> "prepayment", "Предоплаты" -> "prepayment",
    "Срок аренды" -> "rental_period", "lease_term" -> "rental_period",
    "Торг" -> "negotiable", "Условия проживания" -> "living_conditions",
    "Балкон/лоджия" -> "balcony", "Вид из окон" -> "view",
    "Высота потолков" -> "ceiling_height", "Год постройки" -> "year_built",
    "Жилая площадь" -> "living_area", "Комнат в аренду" -> "rooms_for_rent",
    "Комнат в квартире" -> "rooms_in_apartment",
    "Общая площадь" -> "total_area", "Планировка" -> "layout",
    "Площадь комнат" -> "room_area", "Площадь кухни" -> "kitchen_area",
    "Ремонт" -> "renovation", "Санузел" -> "bathroom",
    "Спальных мест" -> "sleeping_places", "Тип жилья" -> "apartment_type",
    "Этаж" -> "floor_combined", "Аварийность" -> "emergency",
    "Газоснабжение" -> "gas_supply", "Количество лифтов" -> "elevators",
    "Мусоропровод" -> "garbage_chute", "Отопление" -> "heating",
    "Парковка" -> "parking", "Подъезды" -> "entrances",
    "Строительная серия" -> "building_series", "Тип дома" -> "building_type",
    "Тип перекрытий" -> "ceiling_type",
  )

  /** Amenity feature labels → boolean flag columns (flatten.py:45-54,
    * fed by the FeaturesItem array, html_parser.py:176-182). */
  val amenityFlags: Map[String, String] = Map(
    "Холодильник" -> "has_refrigerator",
    "Посудомоечная машина" -> "has_dishwasher",
    "Стиральная машина" -> "has_washing_machine",
    "Кондиционер" -> "has_air_conditioner",
    "Интернет" -> "has_internet", "Ванна" -> "has_bathtub",
    "Мебель в комнатах" -> "has_room_furniture", "Телевизор" -> "has_tv",
    "Мебель на кухне" -> "has_kitchen_furniture",
    "Душевая кабина" -> "has_shower_cabin",
  )

  /** Flatten a parsed-page frame (schema of [[graft.parse.ParsedPage]])
    * into the canonical flat listing schema. */
  def apply(parsed: DataFrame): DataFrame = {
    val bag = col("attrs")
    def fromBag(ru: String): Column = element_at(bag, ru)

    // canonical value per mapped column, coalescing alias labels
    val mapped: Map[String, Column] = fieldMappings.groupBy(_._2).map {
      case (canon, entries) =>
        canon -> coalesce(entries.keys.toSeq.sorted.map(fromBag): _*)
    }

    val titleInfo = Functions.parseOfferTitle(col("title"))
    val stats = Functions.parseOfferStats(col("offer_stats"))
    val geo = Functions.geoFromItems(col("address_items"))
    val floorInfo = Functions.parseFloor(
      coalesce(mapped("floor_combined"), titleInfo.getField("floor")))

    val street = Functions.normalizeStreetNames(geo.getField("street"))
    val builtAddress = Functions.buildAddress(
      geo.getField("city"), street, geo.getField("building"))

    val knownKeys = fieldMappings.keys.toSeq
    val extras = map_filter(bag,
      (k, _) => !knownKeys.map(lit(_) === k).reduce(_ || _))

    parsed
      // rental terms: positional PriceInfo (already columns) wins
      .withColumn("rental_period",
        coalesce(col("rental_period"), mapped("rental_period")))
      .withColumn("utilities_payment",
        coalesce(col("utilities_payment"), mapped("utilities_payment")))
      .withColumn("commission", coalesce(col("commission"), mapped("commission")))
      .withColumn("security_deposit",
        coalesce(col("security_deposit"), mapped("security_deposit")))
      .withColumn("prepayment", mapped("prepayment"))
      .withColumn("negotiable", mapped("negotiable"))
      .withColumn("living_conditions", mapped("living_conditions"))
      // areas / layout: label bag wins over title-derived (insertion order)
      .withColumn("total_area",
        coalesce(mapped("total_area"), titleInfo.getField("total_area")))
      .withColumn("living_area", mapped("living_area"))
      .withColumn("kitchen_area", mapped("kitchen_area"))
      .withColumn("room_area", mapped("room_area"))
      .withColumn("ceiling_height", mapped("ceiling_height"))
      .withColumn("room_count", titleInfo.getField("room_count"))
      .withColumn("rooms_for_rent", mapped("rooms_for_rent"))
      .withColumn("rooms_in_apartment", mapped("rooms_in_apartment"))
      .withColumn("sleeping_places", mapped("sleeping_places"))
      .withColumn("floor_combined", mapped("floor_combined"))
      .withColumn("floor", floorInfo.getField("floor"))
      .withColumn("total_floors",
        coalesce(floorInfo.getField("total_floors"),
          titleInfo.getField("total_floors")))
      // building attributes
      .withColumn("apartment_type", mapped("apartment_type"))
      .withColumn("layout", mapped("layout"))
      .withColumn("renovation", mapped("renovation"))
      .withColumn("bathroom", mapped("bathroom"))
      .withColumn("balcony", mapped("balcony"))
      .withColumn("view", mapped("view"))
      .withColumn("year_built", mapped("year_built"))
      .withColumn("building_type", mapped("building_type"))
      .withColumn("building_series", mapped("building_series"))
      .withColumn("ceiling_type", mapped("ceiling_type"))
      .withColumn("heating", mapped("heating"))
      .withColumn("parking", mapped("parking"))
      .withColumn("elevators", mapped("elevators"))
      .withColumn("entrances", mapped("entrances"))
      .withColumn("gas_supply", mapped("gas_supply"))
      .withColumn("garbage_chute", mapped("garbage_chute"))
      .withColumn("emergency", mapped("emergency"))
      // amenity flags: present → true, absent → null (merge null-skip)
      .transform { df =>
        amenityFlags.foldLeft(df) { case (acc, (ru, flag)) =>
          acc.withColumn(flag,
            when(array_contains(col("features"), ru), lit(true)))
        }
      }
      // geo
      .withColumn("city", geo.getField("city"))
      .withColumn("district", geo.getField("district"))
      .withColumn("neighborhood", geo.getField("neighborhood"))
      .withColumn("street", street)
      .withColumn("street_id", geo.getField("street_id"))
      .withColumn("building", geo.getField("building"))
      .withColumn("building_id", geo.getField("building_id"))
      .withColumn("metro_station",
        coalesce(col("metro_station"), geo.getField("metro_station")))
      .withColumn("metro_id", geo.getField("metro_id"))
      .withColumn("address",
        when(builtAddress =!= "", builtAddress).otherwise(col("address")))
      // views
      .withColumn("total_views", stats.getField("total_views"))
      .withColumn("today_views", stats.getField("today_views"))
      .withColumn("unique_views", stats.getField("unique_views"))
      // open-vocabulary tail
      .withColumn("extras", extras)
      .drop("attrs", "address_items")
  }
}
