package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: known values, round-trip, range guard") {
    // a=101b, b=011b → z = 11011b = 27
    assert(ZOrder64.interleave(5L, 3L) == 27L)
    assert(ZOrder64.interleave(0L, 0L) == 0L)
    assert(ZOrder64.interleave(0xffffffffL, 0L) == 0x5555555555555555L)
    assert(ZOrder64.interleave(0L, 0xffffffffL) == 0xaaaaaaaaaaaaaaaaL)
    // de-interleave round-trip over a deterministic value sweep
    def unspread(z: Long): Long = {
      var x = z & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
      x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
      x = (x | (x >> 8)) & 0x0000ffff0000ffffL
      (x | (x >> 16)) & 0x00000000ffffffffL
    }
    for (i <- 0 until 200) {
      val a = (i * 2654435761L) & 0xffffffffL
      val b = (i * 40503L + 17L) & 0xffffffffL
      val z = ZOrder64.interleave(a, b)
      assert(unspread(z) == a && unspread(z >>> 1) == b)
    }
    intercept[IllegalArgumentException] { ZOrder64.interleave(-1L, 0L) }
    intercept[IllegalArgumentException] {
      ZOrder64.interleave(0x100000000L, 0L)
    }
  }

  test("expression evaluates in a DataFrame (codegen path) and matches " +
      "the static interleave") {
    val df = spark.range(1000)
      .select($"id".as("a"), (($"id" * 7) % 1000).as("b"))
    val out = df.select($"a", $"b", ZOrder64($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (a, b, z) =>
      assert(z == ZOrder64.interleave(a, b))
    }
    // null in → null out (nullSafeEval contract)
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
    assert(withNull.select(ZOrder64($"a", $"b")).collect().head.isNullAt(0))
  }

  test("clusterByZOrder: partition z-ranges are disjoint and ordered " +
      "(tight min/max on both dims per partition)") {
    val df = spark.range(20000)
      .select(($"id" % 251).as("u"), (($"id" * 13) % 509).as("t"))
    val clustered = ZOrder64.clusterByZOrder(df, $"u", $"t", partitions = 8)
    val ranges = clustered
      .select(spark_partition_id().as("p"), ZOrder64($"u", $"t").as("z"))
      .groupBy($"p").agg(min($"z").as("lo"), max($"z").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
