package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the 100 TB path. AQE's skew-join split
  * handles storage-level skew automatically; these cover the two cases
  * it can't: aggregation hot keys and broadcast-ineligible skewed joins.
  */
object SkewOps {

  /** Two-phase salted aggregation: a hot grouping key that overwhelms
    * one reducer is split across `saltBuckets` partial groups, then the
    * partials are combined. Works for any algebraic aggregate given its
    * (partial, combine) pair; here: the common count/sum family.
    *
    * salt = deterministic hash of a spread column (or random when
    * `spreadCol` is None — fine for aggregation, not for joins).
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltBuckets: Int, spreadCol: Option[String] = None): DataFrame = {
    val salt = spreadCol match {
      case Some(c) => pmod(hash(col(c)), lit(saltBuckets))
      case None    => (rand(42) * saltBuckets).cast("int")
    }
    val partial = df.withColumn("__salt", salt)
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }

  /** Salted join for a skewed fact against a non-broadcastable dim:
    * fact rows keep their key + a salt from a spread column; the dim is
    * replicated `saltBuckets`× with an exploded salt, so each hot key's
    * rows scatter over `saltBuckets` reducers instead of one.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int, spreadCol: String): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(spreadCol)), lit(saltBuckets)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** EXACT equi-join output-size prediction WITHOUT running the join:
    * |A ⋈ B| = Σ_k cA(k)·cB(k), computed by joining the two per-key
    * COUNT tables — a |distinct keys|-sized join, not a |rows|-sized
    * one. This is what a planner consults before committing to a
    * strategy at 100 TB: a predicted blow-up (hot key × hot key)
    * argues for salting ([[saltedJoin]]) or a pre-aggregation;
    * `max_key_product` names the single worst key's contribution —
    * the reducer that would melt.
    *
    * Scale shape: two map-side-combined count aggregations + one
    * key-table join + one scalar fold. Nothing touches a payload
    * column; with column pruning the scans read only the key.
    *
    * @return one row: (predicted_rows, max_key_product) */
  def joinSizeEstimate(a: DataFrame, b: DataFrame,
      key: String): DataFrame = {
    val ca = a.groupBy(col(key)).agg(count(lit(1)).as("__ca"))
    val cb = b.groupBy(col(key)).agg(count(lit(1)).as("__cb"))
    ca.join(cb, key)
      .select((col("__ca") * col("__cb")).as("__p"))
      .agg(coalesce(sum(col("__p")), lit(0L)).as("predicted_rows"),
        coalesce(max(col("__p")), lit(0L)).as("max_key_product"))
  }
}
