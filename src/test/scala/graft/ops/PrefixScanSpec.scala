package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

import graft.SparkSpec

class PrefixScanSpec extends SparkSpec {
  import spark.implicits._

  /** running sum of x — the minimal nontrivial monoid (state reads a
    * column, unlike the rank counter) */
  private val sumMonoid = new PrefixScan.ScanMonoid[Long] {
    def stepCols: Seq[String] = Seq("x")
    def zero: Long = 0L
    def step(s: Long, v: Array[Any]): Long = s + v(0).asInstanceOf[Long]
    def combine(a: Long, b: Long): Long = a + b
    def emit(post: Long, v: Array[Any]): Seq[Any] = Seq(post)
  }
  private val outF =
    Seq(StructField("cum", LongType, nullable = false))

  test("scan: running sum matches the sequential fold at any " +
      "partition count, including p > distinct keys (empty partitions)") {
    val xs = Seq(5L, -3L, 7L, 0L, 2L, -9L, 4L)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("t", "x")
    val expected = xs.scanLeft(0L)(_ + _).tail
      .zipWithIndex.map { case (c, i) => (i.toLong, c) }.toSet
    for (p <- Seq(1, 3, 32)) { // 32 > 7 rows → empty partitions
      val got = PrefixScan.scan[Long](df, Seq(col("t")), outF,
          sumMonoid, numPartitions = p)
        .select("t", "cum").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"p=$p")
    }
  }

  test("scan: emitCols are visible to emit but not folded in pass 1") {
    // emit scales the running sum by a per-row factor that step never
    // sees — wrong pass-1 projection would throw or mis-fold
    val m = new PrefixScan.ScanMonoid[Long] {
      def stepCols: Seq[String] = Seq("x")
      override def emitCols: Seq[String] = Seq("f")
      def zero: Long = 0L
      def step(s: Long, v: Array[Any]): Long =
        s + v(0).asInstanceOf[Long]
      def combine(a: Long, b: Long): Long = a + b
      def emit(post: Long, v: Array[Any]): Seq[Any] =
        Seq(post * v(1).asInstanceOf[Long])
    }
    val df = Seq((1L, 10L, 2L), (2L, 5L, 3L), (3L, 1L, 10L))
      .toDF("t", "x", "f")
    val got = PrefixScan.scan[Long](df, Seq(col("t")), outF, m,
        numPartitions = 2)
      .select("t", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 20L), (2L, 45L), (3L, 160L)))
  }

  test("scan: monotone done() truncates rows and skips tail " +
      "partitions wholesale") {
    val m = new PrefixScan.ScanMonoid[Long] {
      def stepCols: Seq[String] = Nil
      def zero: Long = 0L
      def step(s: Long, v: Array[Any]): Long = s + 1L
      def combine(a: Long, b: Long): Long = a + b
      def emit(post: Long, v: Array[Any]): Seq[Any] = Seq(post - 1L)
      override def done(s: Long): Boolean = s >= 4L
    }
    val df = (0L until 100L).map(t => (t, t)).toDF("t", "x")
    val got = PrefixScan.scan[Long](df, Seq(col("t")), outF, m,
        numPartitions = 8)
      .select("t", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L)))
  }
}
