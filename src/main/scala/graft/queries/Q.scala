package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
  * over the same parquet tables. The driver hash-compares the two at
  * sf0.01 (see repo BASELINE.md "Our engine's gate").
  *
  * Determinism rules every query obeys so the hash compare is stable:
  *   - money sums go through `decimal(18,2)` casts (order-independent
  *     exact addition — double sums would differ in the last ulp between
  *     Spark's partial aggregation tree and DuckDB's serial sum);
  *   - every aggregate / computed column is aliased identically in the
  *     Spark code and the SQL (driver sorts columns by name);
  *   - ties in top-k / last-wins are broken by a unique key column.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

trait QueryModule {
  def queries: Seq[Q]
}
