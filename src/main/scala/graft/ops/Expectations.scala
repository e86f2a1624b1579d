package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation: declarative expectations over a frame,
  * evaluated into one violations report — the quality gate a
  * production table publishes alongside itself (the Great Expectations
  * / dbt-tests shape, Spark-first). A contract is data, not code:
  * downstream consumers read the report row for the rule they depend
  * on instead of re-scanning the table.
  *
  * Scale shape: all ROW-LOCAL rules (not-null, range, regex) fold into
  * ONE conditional-aggregation pass over the scan — adding a rule adds
  * a codegen'd sum, not a job. Rules that are joins by nature pay
  * exactly their join and nothing else: uniqueness is one group-by on
  * the key (map-side partial), referential integrity is one left-anti
  * join with the dimension side broadcast when small. The report
  * frame is |rules|-sized.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** `col` must never be null. */
  final case class NotNull(col: String) extends Rule {
    val name = s"not_null:$col"
  }

  /** `col` (numeric) must lie in [lo, hi], nulls violate. */
  final case class InRange(col: String, lo: Long, hi: Long) extends Rule {
    require(lo <= hi, s"empty range [$lo, $hi]")
    val name = s"in_range:$col"
  }

  /** `col` must fully match `regex`, nulls violate. */
  final case class Matches(col: String, regex: String) extends Rule {
    val name = s"matches:$col"
  }

  /** `cols` must be unique across the frame; every row of every
    * duplicated key counts as a violation. */
  final case class Unique(cols: Seq[String]) extends Rule {
    require(cols.nonEmpty, "Unique needs at least one column")
    val name = s"unique:${cols.mkString(",")}"
  }

  /** Every non-null `col` must exist in `dimCol` of `dim`
    * (referential integrity; orphan rows violate). */
  final case class ForeignKey(col: String, dim: DataFrame,
      dimCol: String) extends Rule {
    val name = s"foreign_key:$col"
  }

  /** Evaluate `rules` against `df`.
    *
    * @return (rule, n_rows, n_violations, pass) — one row per rule,
    *         n_rows the frame's row count repeated for context */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rules in ${rules.map(_.name)}")
    val rowLocal = rules.collect {
      case r: NotNull => r.name -> col(r.col).isNull
      case r: InRange => r.name ->
        (col(r.col).isNull || col(r.col) < r.lo || col(r.col) > r.hi)
      case r: Matches => r.name ->
        !coalesce(col(r.col).rlike(s"^(?:${r.regex})$$"), lit(false))
    }
    val spark = df.sparkSession
    import spark.implicits._
    // one pass: total count + every row-local rule's violation sum
    val aggs = count(lit(1)).as("__n") +: rowLocal.map { case (n, bad) =>
      sum(when(bad, 1L).otherwise(0L)).as(s"__v$n")
    }
    val base = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = base.getLong(0)
    val local = rowLocal.zipWithIndex.map { case ((n, _), i) =>
      (n, base.getLong(i + 1))
    }
    val joined = rules.collect {
      case r: Unique =>
        val dup = df.groupBy(r.cols.map(col): _*)
          .agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
          .agg(coalesce(sum(col("__c")), lit(0L))).head().getLong(0)
        (r.name, dup)
      case r: ForeignKey =>
        val orphans = df.select(col(r.col)).filter(col(r.col).isNotNull)
          .join(broadcast(r.dim.select(col(r.dimCol).as(r.col))
            .distinct()), Seq(r.col), "left_anti")
          .count()
        (r.name, orphans)
    }
    val byName = (local ++ joined).toMap
    rules.map(r => (r.name, nRows, byName(r.name), byName(r.name) == 0L))
      .toDF("rule", "n_rows", "n_violations", "pass")
  }
}
