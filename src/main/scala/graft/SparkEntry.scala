package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-family modules under [[graft.queries]];
  * each entry pairs a Spark implementation with (when expressible) a
  * DuckDB oracle SQL over the same parquet tables.
  */
object SparkEntry {

  /** All registered query modules (SURVEY §2 families). */
  def modules: Seq[QueryModule] = Seq(
    Relational,
    RefFunctions,
    MergeQueries,
    CorpusQueries,
    ParseQueries,
    PipelineQueries,
    StreamingQueries,
    AnalyticsQueries,
    RetrievalQueries,
  )

  private lazy val all: Seq[Q] = modules.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
