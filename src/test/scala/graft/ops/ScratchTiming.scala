package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.ops.Materialize.MaterializeOps

// throwaway — not committed
class ScratchTiming extends SparkSpec {
  test("star rounds timing") {
    import spark.implicits._
    val li = graft.model.Tables.lineitem(spark, "/root/testdata/sf0.1")
      .filter($"l_partkey" % 7 === 0 && $"l_orderkey" % 7 === 0)
      .select($"l_orderkey", $"l_partkey")
    val pairs = li.as("x").join(li.as("y"),
        $"x.l_orderkey" === $"y.l_orderkey" && $"x.l_partkey" < $"y.l_partkey")
      .select($"x.l_partkey".as("src"), $"y.l_partkey".as("dst")).distinct()
      .filter(($"src" + $"dst") % 5 =!= 0)
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[scratch] $name%-22s ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    // replicate the loop with per-round timing
    var edges = t("canon edges") {
      val e = pairs.select(col("src").as("__x"), col("dst").as("__y"))
        .filter(col("__x") =!= col("__y"))
        .select(least(col("__x"), col("__y")).as("u"),
          greatest(col("__x"), col("__y")).as("v"))
        .distinct().materialized
      e.count(); e
    }
    var ec = edges.count()
    var done = false; var i = 0
    while (i < 25 && !done) {
      val next = t(s"round $i starRound") {
        val adj = edges.select(col("u"), col("v"))
          .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
        val mins = adj.groupBy(col("u")).agg(min(col("v")).as("__mn"))
          .select(col("u"), least(col("u"), col("__mn")).as("m"))
        val ls = adj.join(mins, "u").filter(col("v") > col("u"))
          .select(col("m").as("u"), col("v")).distinct()
        val sAdj = ls.select(col("v").as("big"), col("u").as("small"))
        val sMin = sAdj.groupBy(col("big")).agg(min(col("small")).as("__mn"))
        sAdj.join(sMin, "big")
          .select(col("__mn").as("u"),
            explode(array(col("small"), col("big"))).as("v"))
          .filter(col("u") =!= col("v")).distinct().materialized
      }
      val nc = t(s"round $i count") { next.count() }
      done = t(s"round $i eqcheck") {
        nc == ec && next.exceptAll(edges).isEmpty }
      edges = next; ec = nc; i += 1
    }
    println(s"[scratch] rounds = $i")
  }
}
