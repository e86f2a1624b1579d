package graft.ops

import graft.SparkSpec

class LinAlgSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen recovers a hand-built spectrum, descending") {
    // A = diag(3, 1) rotated by 45°: eigenvalues {3, 1},
    // eigenvectors (±1/√2, 1/√2)
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (evals, evecs) = LinAlg.jacobiEigen(a)
    assert(math.abs(evals(0) - 3.0) < 1e-12 &&
      math.abs(evals(1) - 1.0) < 1e-12)
    // columns are unit eigenvectors: A v = λ v
    for (c <- 0 to 1) {
      val v = Array(evecs(0)(c), evecs(1)(c))
      val av = Array(a(0)(0) * v(0) + a(0)(1) * v(1),
        a(1)(0) * v(0) + a(1)(1) * v(1))
      assert(math.abs(av(0) - evals(c) * v(0)) < 1e-12)
      assert(math.abs(av(1) - evals(c) * v(1)) < 1e-12)
    }
  }

  test("fitZcaWhitening + whiten: whitened sample covariance is the " +
      "identity, deterministic across partitioning") {
    // deterministic anisotropic cloud: strongly correlated dims
    val rows = (0 until 200).map { i =>
      val t = i / 200.0 * 2 * math.Pi
      val u = math.sin(37.0 * t)
      (i.toLong, Seq(10.0 * math.cos(t) + u, 3.0 * math.sin(t) - 2 * u,
        u + 0.1 * math.cos(3 * t)))
    }
    val df = rows.toDF("id", "vec")
    val model = LinAlg.fitZcaWhitening(df, "vec", dim = 3)
    assert(model.eigvals.length == 3 &&
      model.eigvals.sliding(2).forall(p => p(0) >= p(1)))
    val verdict = LinAlg.whitenVerdict(df, "id", "vec", dim = 3)
      .as[(String, Boolean, Long)].collect()
      .map { case (k, v, d) => k -> ((v, d)) }.toMap
    assert(verdict("cov_is_identity") == ((true, 200L)), verdict)
    assert(verdict("mean_is_zero")._1, verdict)
    assert(verdict("eigvals_nonneg")._1, verdict)
    assert(verdict("n_vectors")._2 == 200L)
    assert(verdict("dim")._2 == 3L)
    // model fit is partitioning-independent up to float associativity:
    // treeAggregate changes combine ORDER, so compare within tolerance
    val model7 = LinAlg.fitZcaWhitening(df.repartition(7), "vec", 3)
    model.eigvals.zip(model7.eigvals).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9, s"$x vs $y")
    }
  }

  test("whiten rejects wrong-length vectors loudly; fit rejects n < 2") {
    val bad = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0, 2.0, 3.0)))
      .toDF("id", "vec")
    val e = intercept[Exception] {
      LinAlg.fitZcaWhitening(bad, "vec", dim = 3)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("length-3")))
    intercept[IllegalArgumentException] {
      LinAlg.fitZcaWhitening(
        Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "vec"), "vec", 3)
    }
  }

  test("whiten plan: one typed map over the scan — no Exchange") {
    val df = (0 until 64).map(i =>
      (i.toLong, Seq(i.toDouble, (i * i % 17).toDouble)))
      .toDF("id", "vec")
    val model = LinAlg.fitZcaWhitening(df, "vec", dim = 2)
    val plan = LinAlg.whiten(df, "id", "vec", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
