package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-record validation — the schema gate a tool-use /
  * function-calling dataset runs before training: every record's JSON
  * payload must parse, be an object, and carry the required top-level
  * keys. Emits per-row signals and an error class (not a filter) — the
  * audit a curation run publishes next to the drop decision, and the
  * error-class histogram is the dataset-card row.
  *
  * Presence is judged on KEYS (`json_object_keys`), not values — a key
  * with a JSON `null` value counts as present. This is deliberate:
  * value-based probes (`get_json_object` returning SQL NULL) cannot
  * distinguish absent from present-null, and engines disagree on that
  * edge; key-presence is portable (q147's DuckDB twin restates it via
  * `json_keys`).
  *
  * Pure map riding the corpus scan — no shuffle; the JSON parse is the
  * only cost and runs once per row (Catalyst collapses the shared
  * subexpressions).
  */
object StructuredData {

  /** @param required top-level keys every record must carry
    * @return (idCol, is_json, is_object, n_keys, n_missing,
    *         error_class ∈ {ok, not_json, not_object, missing_fields},
    *         valid_record) */
  def validateJsonRecords(df: DataFrame, idCol: String, jsonCol: String,
      required: Seq[String]): DataFrame = {
    require(required.nonEmpty, "need at least one required field")
    val c = coalesce(col(jsonCol), lit(""))
    val isJson = get_json_object(c, "$").isNotNull
    val isObject = isJson && startswith(ltrim(c), lit("{"))
    val keys = when(isObject, json_object_keys(c))
      .otherwise(array().cast("array<string>"))
    val nMissing =
      size(array_except(array(required.map(lit): _*), keys)).cast("long")
    val errorClass = when(!isJson, "not_json")
      .when(!isObject, "not_object")
      .when(nMissing > 0L, "missing_fields")
      .otherwise("ok")
    df.select(col(idCol),
      isJson.as("is_json"),
      isObject.as("is_object"),
      coalesce(size(keys), lit(0)).cast("long").as("n_keys"),
      nMissing.as("n_missing"),
      errorClass.as("error_class"),
      (errorClass === "ok").as("valid_record"))
  }
}
