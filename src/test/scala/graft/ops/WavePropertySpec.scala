package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round's final-wave operators: apportionment
  * conservation, IVM join-delta ≡ recompute, weighted-quantile vs
  * brute force, DBSCAN vs a reference implementation, Mann–Whitney's
  * rank-sum identity. Batched — one Spark job per property. */
class WavePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long = 7L): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("largestRemainder: Σalloc == total and |alloc − ideal| < 1 " +
      "for random weights") {
    val weights = samples(Gen.chooseNum(1L, 10000L), 40)
    val df = weights.zipWithIndex
      .map { case (w, i) => (f"g$i%03d", w) }.toDF("g", "w")
    val total = 99991L
    val out = Sampling.largestRemainder(df, "g", col("w"), total)
      .as[(String, Long, Long)].collect()
    assert(out.map(_._3).sum == total)
    val wsum = weights.sum.toDouble
    out.foreach { case (g, w, alloc) =>
      val ideal = total * (w / wsum)
      assert(math.abs(alloc - ideal) < 1.0,
        s"$g alloc=$alloc ideal=$ideal") // Hamilton never off by ≥1
    }
  }

  test("joinDelta + applyCdcToAgg ≡ from-scratch recompute on random " +
      "CDC histories") {
    val rnd = new scala.util.Random(11)
    // rows: (uid, key, payload); key space small → real join fan-out
    val aAll = (0 until 120).map(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(50).toLong))
    val bAll = (0 until 150).map(i =>
      (i.toLong + 1000, rnd.nextInt(12).toLong, rnd.nextInt(90).toLong))
    val aOldRows = aAll.filter(_._1 % 3 != 0)
    val bOldRows = bAll.filter(_._1 % 4 != 0)
    val aInserts = aAll.filter(_._1 % 3 == 0)
    val bInserts = bAll.filter(_._1 % 4 == 0)
    val aDeletes = aOldRows.filter(_._1 % 5 == 1)
    val bDeletes = bOldRows.filter(_._1 % 7 == 2)
    def df3(rows: Seq[(Long, Long, Long)]) =
      rows.map(r => (r._2, r._3)).toDF("k", "v")
    val aOld = df3(aOldRows); val bOld = df3(bOldRows)
      .withColumnRenamed("v", "u")
    val dA = df3(aInserts).withColumn("sgn", lit(1L))
      .unionByName(df3(aDeletes).withColumn("sgn", lit(-1L)))
    val dB = df3(bInserts).withColumnRenamed("v", "u")
      .withColumn("sgn", lit(1L))
      .unionByName(df3(bDeletes).withColumnRenamed("v", "u")
        .withColumn("sgn", lit(-1L)))
    val vOld = aOld.join(bOld, "k").groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v" + $"u").as("s"))
    val dJ = Incremental.joinDelta(aOld, dA, bOld, dB, "k", "sgn")
      .select($"k", $"sgn", ($"v" + $"u").as("val"))
    val maintained = Incremental
      .applyCdcToAgg(vOld, dJ, "k", "sgn", "val")
      .as[(Long, Long, Long)].collect().toSet
    // recompute from effective multisets
    def eff(old: Seq[(Long, Long, Long)], ins: Seq[(Long, Long, Long)],
        del: Seq[(Long, Long, Long)]) = {
      val delCounts = scala.collection.mutable.Map[(Long, Long), Int]()
      del.foreach(r => delCounts((r._2, r._3)) =
        delCounts.getOrElse((r._2, r._3), 0) + 1)
      old.filter { r =>
        val c = delCounts.getOrElse((r._2, r._3), 0)
        if (c > 0) { delCounts((r._2, r._3)) = c - 1; false } else true
      } ++ ins
    }
    val aNew = eff(aOldRows, aInserts, aDeletes)
    val bNew = eff(bOldRows, bInserts, bDeletes)
    val expected = (for {
      (_, ka, va) <- aNew; (_, kb, ub) <- bNew if ka == kb
    } yield (ka, va + ub))
      .groupBy(_._1)
      .map { case (k, rows) =>
        (k, rows.size.toLong, rows.map(_._2).sum) }
      .filter(_._2 != 0L).toSet
    assert(maintained == expected)
  }

  test("weightedQuantilesLong matches a serial brute force on random " +
      "weighted multisets") {
    val pairs = samples(
      Gen.zip(Gen.chooseNum(-500L, 500L), Gen.chooseNum(0L, 9L)), 400)
    val df = pairs.toDF("v", "w").repartition(8)
    val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 1.0)
    val out = SketchStats.weightedQuantilesLong(df, "v", "w", ps)
      .as[(Double, Long)].collect().toMap
    val pos = pairs.filter(_._2 > 0)
    val total = pos.map(_._2).sum
    val sorted = pos.sortBy(_._1)
    def brute(p: Double): Long = {
      val target = math.ceil(p * total.toDouble).toLong
      var cum = 0L
      sorted.iterator.map { case (v, w) => cum += w; (v, cum) }
        .collectFirst { case (v, c) if c >= target => v }.get
    }
    ps.foreach(p => assert(out(p) == brute(p), s"p=$p"))
  }

  test("dbscanGrid matches a reference DBSCAN on random points") {
    val rnd = new scala.util.Random(23)
    val pts = (0 until 120).map(i =>
      (i.toLong, rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
    val (r, minPts) = (25L, 3)
    val out = GeoOps.dbscanGrid(pts.toDF("id", "x", "y"), "id", "x",
      "y", r, minPts).as[(Long, String, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // reference: brute-force neighbors, cores, min-core-id components,
    // border = min cluster over core neighbors
    val nbrs = pts.map { case (i, x, y) =>
      i -> pts.filter { case (j, a, b) =>
        j != i && (a - x) * (a - x) + (b - y) * (b - y) <= r * r
      }.map(_._1).toSet
    }.toMap
    val cores = pts.map(_._1).filter(i => nbrs(i).size + 1 >= minPts)
      .toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(
      cores.map(c => c -> c).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (c <- cores; n <- nbrs(c) if cores(n)) {
      val (a, b) = (find(c), find(n))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val clusterOf = cores.map(c => c -> {
      // min id in component
      cores.filter(o => find(o) == find(c)).min
    }).toMap
    pts.foreach { case (i, _, _) =>
      if (cores(i)) assert(out(i) == (("core", clusterOf(i))), s"id=$i")
      else {
        val coreNbrs = nbrs(i).filter(cores)
        if (coreNbrs.nonEmpty)
          assert(out(i) == (("border", coreNbrs.map(clusterOf).min)),
            s"id=$i")
        else assert(out(i) == (("noise", -1L)), s"id=$i")
      }
    }
  }

  test("applyEdgesToComponents ≡ from-scratch CC on random graphs " +
      "and random insert batches") {
    val rnd = new scala.util.Random(41)
    val allEdges = (0 until 200).map(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2).distinct
    val (newE, oldE) = allEdges.partition(_ => rnd.nextBoolean())
    val oldLabels = Dedup.duplicateClustersStar(
      oldE.toDF("src", "dst"), "src", "dst")
    val maintained = Incremental.applyEdgesToComponents(
      oldLabels, newE.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    // reference: union-find over ALL edges
    val nodes = allEdges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.Map(
      nodes.map(n => n -> n): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    allEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = nodes.map(n => n ->
      nodes.filter(o => find(o) == find(n)).min).toMap
    assert(maintained == expected)
  }

  test("applyEdgesToComponents refuses signed (deletion-capable) input") {
    val labels = Seq((1L, 1L)).toDF("id", "cluster_id")
    val signed = Seq((1L, 2L, -1L)).toDF("src", "dst", "sgn")
    intercept[IllegalArgumentException] {
      Incremental.applyEdgesToComponents(labels, signed, "src", "dst")
    }
  }

  test("mannWhitneyUx2: U1 + U2 == 2·n1·n2 for random two-group data") {
    val vals = samples(Gen.chooseNum(-100L, 100L), 160, seed = 31L)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (if (i % 3 == 0) "A" else "B", v, i.toLong) }
      .toDF("grp", "v", "uid")
    val out = RankStats.mannWhitneyUx2(df, "grp", "v", "uid")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    val (na, ua) = out("A"); val (nb, ub) = out("B")
    assert(ua + ub == 2L * na * nb)
    assert(ua >= 0 && ub >= 0) // doubled Us are non-negative
  }
}
