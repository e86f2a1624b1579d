package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** A2/A3/P7: YAML search predicates compiled into a source "scan spec" —
  * the reference's only pushdown mechanism (predicates reach the remote
  * source inside the URL; the engine never post-filters). Key order in
  * the produced query string follows the reference's dict-iteration
  * semantics: insertion order of the YAML mapping
  * (search_configs/construct_url.py:16-40, search_config.yaml).
  */
case class SearchConfig(
    maxprice: Option[Long],
    district: Seq[Long],
    metro: Seq[Long],
    rooms: Seq[Int],
    street: Seq[Long],
    keyOrder: Seq[String],
)

object SearchConfig {

  def fromYaml(yaml: String): SearchConfig = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val root = mapper.readTree(yaml)
    def longs(field: String): Seq[Long] = Option(root.get(field))
      .filter(n => n.isArray)
      .map(_.elements().asScala.map(_.asLong()).toSeq)
      .getOrElse(Seq.empty)
    SearchConfig(
      maxprice = Option(root.get("maxprice")).filter(_.isNumber).map(_.asLong()),
      district = longs("district"),
      metro = longs("metro"),
      rooms = longs("rooms").map(_.toInt),
      street = longs("street"),
      keyOrder = root.fieldNames().asScala.toSeq,
    )
  }

  private val fixedPrefix =
    "cat.php?currency=2&engine_version=2&type=4&deal_type=rent&sort=creation_date_desc&"

  /** construct_search_url: predicates → query string; sort pre-applied at
    * the source (= the engine's ORDER BY pushdown). */
  def searchUrl(baseUrl: String, cfg: SearchConfig): String = {
    val parts = cfg.keyOrder.flatMap {
      case "district" => cfg.district.zipWithIndex.map {
        case (d, i) => s"district[$i]=$d" }
      case "street" => cfg.street.zipWithIndex.map {
        case (s, i) => s"street[$i]=$s" }
      case "metro" => cfg.metro.zipWithIndex.map {
        case (m, i) => s"metro[$i]=$m" }
      case "rooms" => cfg.rooms.map(r => s"room$r=1")
      case "maxprice" => cfg.maxprice.map(p => s"maxprice=$p").toSeq
      case other => Seq.empty // unknown scalar keys: none in the schema
    }
    (s"$baseUrl/$fixedPrefix" + parts.mkString("&")).stripSuffix("&")
  }

  /** Page fan-out (A3/F17): `&p=1..N` — the source's input partitions. */
  def searchPageUrls(searchUrl: String, totalPages: Int): Seq[String] =
    (1 to totalPages).map(i => s"$searchUrl&p=$i")

  /** Listing-page URLs from an id work-list. */
  def listingUrls(baseUrl: String, offerIds: Seq[String]): Seq[String] =
    offerIds.map(id => s"$baseUrl/rent/flat/$id")
}
