package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage, the Fellegi–Sunter model (JASA 1969):
  * candidate pairs are scored by an AGREEMENT VECTOR over field
  * comparators, each agreement contributing its log(m/u) evidence
  * weight and each disagreement its log((1−m)/(1−u)) penalty; pairs
  * above a threshold link. The repo's integer-exactness convention
  * applies: weights are caller-supplied MILLI log-odds integers (fit
  * them offline via EM or set them from error-rate priors), so the
  * score is an associative integer sum that hashes identically in any
  * engine — the float log arithmetic happens once at weight-fitting
  * time, never per pair.
  *
  * Scale shape — blocking IS the operator: pairs are generated only
  * within equal values of the block key (one hash-partitioned
  * equi-join, never a cross product), the standard way linkage
  * survives n×m tables (Christen, "Data Matching", ch. 4). A skewed
  * block key (one giant city) is the known hazard — salt the block or
  * intersect two blockings upstream; this operator keeps the join
  * declarative so AQE's skew handling applies.
  */
object EntityResolution {

  /** One field comparator: agreement predicate built from the two
    * sides' columns, with its integer milli log-odds weights. */
  final case class Comparator(name: String,
      agree: (Column, Column) => Column,
      leftCol: String, rightCol: String,
      agreeMilli: Long, disagreeMilli: Long) {
    require(agreeMilli >= disagreeMilli,
      s"comparator $name: agreement must not score below disagreement")
  }

  /** Block-join `left` × `right` on equal `blockCol`, score each pair's
    * agreement vector, and keep pairs with score ≥ thresholdMilli.
    *
    * @param leftIdCol / rightIdCol id columns surfaced in the output
    * @return (left_id, right_id, block value, per-comparator agree
    *         flags, score_milli) — matched pairs only */
  def linkage(left: DataFrame, right: DataFrame, blockCol: String,
      leftIdCol: String, rightIdCol: String,
      comparators: Seq[Comparator], thresholdMilli: Long): DataFrame = {
    require(comparators.nonEmpty, "need at least one comparator")
    require(comparators.map(_.name).distinct.size == comparators.size,
      "duplicate comparator names")
    val l = left.select(col(blockCol).as("block") +:
      col(leftIdCol).as("left_id") +:
      comparators.map(c => col(c.leftCol).as(s"__l_${c.name}")): _*)
    val r = right.select(col(blockCol).as("block") +:
      col(rightIdCol).as("right_id") +:
      comparators.map(c => col(c.rightCol).as(s"__r_${c.name}")): _*)
    val paired = l.join(r, "block")
    val flagged = comparators.foldLeft(paired) { (df, c) =>
      df.withColumn(s"agree_${c.name}",
        coalesce(c.agree(col(s"__l_${c.name}"), col(s"__r_${c.name}")),
          lit(false)))
    }
    val score = comparators.map { c =>
      when(col(s"agree_${c.name}"), lit(c.agreeMilli))
        .otherwise(lit(c.disagreeMilli))
    }.reduce(_ + _)
    flagged.withColumn("score_milli", score)
      .filter(col("score_milli") >= thresholdMilli)
      .select(col("left_id") +: col("right_id") +: col("block") +:
        comparators.map(c => col(s"agree_${c.name}")) :+
        col("score_milli"): _*)
  }
}
