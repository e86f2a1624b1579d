package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) query: all rows not dominated by any
  * other row, where A dominates B iff A.minv <= B.minv AND
  * A.maxv >= B.maxv with at least one strict — the classic
  * "cheapest-and-biggest" frontier (Börzsönyi et al., ICDE 2001).
  *
  * Spark-first shape: the naive formulation is a NOT EXISTS over a
  * theta self-join — a nested-loop n² Catalyst can't save. Instead the
  * frontier membership test is a WINDOW scan: sort by minv ascending;
  * a row survives iff its maxv strictly exceeds the running max of all
  * STRICTLY cheaper rows (RANGE frame to -1 — peers at the same minv
  * must not pre-dominate each other) and it ties the max maxv of its
  * own minv peer group. One sort, zero joins.
  *
  * Scale: a single global window would bottleneck on one partition, so
  * the operator runs two phases — a salted local pass (skyline of any
  * subset contains the subset's frontier contribution; dominance is
  * transitive, so union-of-local-skylines ⊇ global skyline) over
  * `salts` hash partitions in parallel, then the same window on the
  * tiny survivor set. Phase-1 output is bounded by |local frontier| ·
  * salts, independent of n for non-adversarial distributions.
  *
  * Exactness: comparisons only — any engine agrees; duplicated
  * (minv, maxv) frontier points all survive (neither strict), matching
  * the NOT EXISTS semantics the oracle brute-forces.
  */
object Skyline {

  /** @param idCol  unique row id (also the salt hash source)
    * @param minCol integer criterion to MINIMIZE
    * @param maxCol integer criterion to MAXIMIZE
    * @param salts  phase-1 parallelism */
  def skyline2d(df: DataFrame, idCol: String, minCol: String,
      maxCol: String, salts: Int = 32): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val base = df.select(col(idCol).as("id"),
      col(minCol).cast("long").as("minv"),
      col(maxCol).cast("long").as("maxv"))
    val local = pass(base.withColumn("__salt",
      pmod(xxhash64(col("id")), lit(salts))), col("__salt"))
    pass(local, lit(0)).drop("__salt")
  }

  private def pass(df: DataFrame, salt: Column): DataFrame = {
    val strictlyCheaper = Window.partitionBy(salt)
      .orderBy(col("minv").asc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val peers = Window.partitionBy(salt, col("minv"))
    df.withColumn("__cm", max(col("maxv")).over(strictlyCheaper))
      .withColumn("__pm", max(col("maxv")).over(peers))
      .filter((col("__cm").isNull || col("maxv") > col("__cm"))
        && col("maxv") === col("__pm"))
      .drop("__cm", "__pm")
  }
}
