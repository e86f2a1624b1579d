package graft.streaming

import graft.SparkSpec
import graft.queries.{MergeQueries, Relational, StreamingQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming-path queries must be value-identical to their batch
  * twins: the streaming delivery (file source, AvailableNow, foreachBatch,
  * atomic publish) is plumbing around the SAME merge/rollup plans, so any
  * divergence is a bug in that plumbing.
  */
class StreamingQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def byName(name: String): (org.apache.spark.sql.SparkSession,
      String) => DataFrame =
    (StreamingQueries.queries ++ MergeQueries.queries ++ Relational.queries)
      .find(_.name == name).get.fn

  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
  }

  test("q41 streaming merge == q38 batch fold on the same subset") {
    val streamed = byName("q41_streaming_merge")(spark, sf)
    val batch = byName("q38_merge_two_batch")(spark, sf)
      .filter(col("user_id") % 7 === 0)
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("q42 streaming rollup == q13 batch rollup") {
    val streamed = byName("q42_streaming_rollup")(spark, sf)
    val batch = byName("q13_hourly_rollup")(spark, sf)
    assert(sortedRows(streamed) == sortedRows(batch))
  }
}
