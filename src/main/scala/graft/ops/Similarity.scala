package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (array<float|double>).
  *
  * Cosine arithmetic is a SEQUENTIAL left fold in double precision —
  * bit-identical to DuckDB's list_sum and to any other engine folding
  * left-to-right, which is what makes the oracle hash-compare exact.
  *
  * Brute-force variants are the correctness baseline (quadratic
  * shuffle-join — fine to ~10^4 vectors per partition group); the
  * random-hyperplane LSH bucketing is the 100 TB path: one shuffle on
  * the bucket key, quadratic only within buckets.
  */
object Similarity {

  /** Cosine similarity of two double arrays (sequential fold). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    def norm(x: Column) =
      sqrt(aggregate(transform(x, p => p * p), lit(0.0), (acc, v) => acc + v))
    dot(a, b) / (norm(a) * norm(b))
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** All pairs (idA < idB) with cosine ≥ tau — exact, brute force. */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      tau: Double): DataFrame = {
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
    val a = v.alias("a")
    val b = v.alias("b")
    a.join(b, col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        cosine(col("a.__v"), col("b.__v")).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Exact top-k neighbors per vector (brute force + per-key window).
    * Ties broken by neighbor id for determinism. */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
    val a = v.alias("a")
    val b = v.alias("b")
    val pairs = a.join(b, col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id"), col(s"b.$idCol").as("neighbor_id"),
        cosine(col("a.__v"), col("b.__v")).as("cosine"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH (seeded on the
    * driver; shipped as literals — they are plan constants). */
  private def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket id (int of numPlanes sign bits) for
    * each vector. Vectors in the same bucket are ANN candidates. */
  def lshBucket(vec: Column, numPlanes: Int, dim: Int,
      seed: Long = 42L): Column = {
    val planes = hyperplanes(numPlanes, dim, seed)
    planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(vec, array(p.map(lit): _*), (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k per vector via MULTI-TABLE sign-LSH: L independent
    * tables of `numPlanes` hyperplanes each; candidates = pairs sharing a
    * bucket in ANY table (single probe per table). One explode + one
    * bucket-key shuffle join; quadratic only within buckets. Recall for a
    * pair at angle θ is 1-(1-(1-θ/π)^numPlanes)^numTables — tune tables
    * up / planes down for recall, the reverse for cost. A single table is
    * near-useless on weakly-correlated data (measured 2% recall@3 with
    * one 8-plane table on the test embeddings; 16×6 gives ~2/3 recall at
    * a quarter of brute-force cost).
    */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      numPlanes: Int, dim: Int, numTables: Int = 16,
      seed: Long = 42L): DataFrame = {
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
    val tables = array((0 until numTables).map(t => struct(
      lit(t).as("tbl"),
      lshBucket(col("__v"), numPlanes, dim, seed + t).as("bucket"))): _*)
    val buckets = v.select(col(idCol), col("__v"), explode(tables).as("bk"))
      .select(col(idCol), col("__v"), col("bk.tbl"), col("bk.bucket"))
    val a = buckets.alias("a")
    val b = buckets.alias("b")
    val pairs = a.join(b, col("a.tbl") === col("b.tbl")
        && col("a.bucket") === col("b.bucket")
        && col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id"), col(s"b.$idCol").as("neighbor_id"))
      .distinct()
      .join(v.select(col(idCol).as("id"), col("__v").as("__va")), "id")
      .join(v.select(col(idCol).as("neighbor_id"), col("__v").as("__vb")),
        "neighbor_id")
      .select(col("id"), col("neighbor_id"),
        cosine(col("__va"), col("__vb")).as("cosine"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
