package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Distributed dense linear algebra for embedding columns: PCA /
  * ZCA whitening fit from one-pass sufficient statistics.
  *
  * Why whitening is a corpus operator at all: embedding models emit
  * anisotropic vectors (a few directions carry most of the variance —
  * the "dominant direction" pathology), which skews cosine-based
  * dedup/retrieval; whitening (Su et al. 2021, "Whitening Sentence
  * Representations") maps the empirical distribution to zero mean and
  * identity covariance so downstream cosine/top-k treats all
  * directions equally.
  *
  * Scale shape — the MLlib RowMatrix.computeGramianMatrix shape: the
  * d×d Gram/covariance is a SUFFICIENT STATISTIC, accumulated in one
  * `treeAggregate` pass (map-side combined, O(d²) per partition, never
  * a d²-per-row explode and never a corpus collect); the
  * eigendecomposition runs on the DRIVER because the input is the
  * d×d model-sized matrix (d = 64 here; even d = 4096 is a 16 M-cell
  * local problem), and the resulting projection broadcasts back —
  * exactly the IVF-centroid fit/apply split. Eigensolver: cyclic
  * Jacobi rotations — deterministic given identical input, no
  * randomized init, converges to machine precision for symmetric
  * matrices (Golub & Van Loan §8.5).
  *
  * Verdict-style checking (the q56/q133 recall-floor convention):
  * float covariance sums are partition-order-dependent in the last
  * ulps, so raw doubles are never cross-engine hashed; the oracled
  * projection asserts THRESHOLDED invariants (whitened covariance
  * within tolerance of identity) plus exact integer facts (n, dim).
  */
object LinAlg {

  /** mean (length d) + whitening matrix W (d×d, row-major) such that
    * (x − mean)ᵀ W has identity sample covariance on the fitted data;
    * eigvals are the covariance eigenvalues, descending. */
  final case class WhiteningModel(mean: Array[Double],
      w: Array[Array[Double]], eigvals: Array[Double])

  /** One-pass sufficient statistics: (n, Σx, Σxxᵀ upper triangle). */
  private def momentStats(df: DataFrame, vecCol: String, dim: Int)
      : (Long, Array[Double], Array[Double]) = {
    val tri = dim * (dim + 1) / 2
    val rows = df.select(col(vecCol).cast(ArrayType(DoubleType)))
      .rdd.map { r =>
        val s = r.getSeq[Double](0)
        require(s != null && s.length == dim,
          s"$vecCol must be non-null length-$dim vectors")
        s.toArray
      }
    val zero = (0L, new Array[Double](dim), new Array[Double](tri))
    rows.treeAggregate(zero)(
      seqOp = { case ((n, s, g), x) =>
        var i = 0
        var k = 0
        while (i < dim) {
          s(i) += x(i)
          var j = i
          while (j < dim) { g(k) += x(i) * x(j); j += 1; k += 1 }
          i += 1
        }
        (n + 1, s, g)
      },
      combOp = { case ((n1, s1, g1), (n2, s2, g2)) =>
        var i = 0
        while (i < dim) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < tri) { g1(i) += g2(i); i += 1 }
        (n1 + n2, s1, g1)
      })
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric d×d matrix.
    * Returns (eigenvalues, eigenvectors as columns), both ordered by
    * eigenvalue descending (ties: by original index — deterministic). */
  private[ops] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = Array.tabulate(d, d)((r, c) => v(r)(order(c)))
    (evals, evecs)
  }

  /** Fit a ZCA whitening model: W = V·diag(1/√(λ+ε))·Vᵀ over the
    * sample covariance (n−1 denominator). ε floors near-zero
    * eigenvalues so a rank-deficient fit clamps instead of exploding.
    * One distributed pass for the moments; eigen on the driver
    * (model-sized); see object doc. */
  def fitZcaWhitening(df: DataFrame, vecCol: String, dim: Int,
      epsilon: Double = 1e-9): WhiteningModel = {
    require(dim >= 1 && dim <= 4096, s"dim must be in [1, 4096], got $dim")
    val (n, s, g) = momentStats(df, vecCol, dim)
    require(n >= 2, s"need at least 2 vectors to fit covariance, got $n")
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var k = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = (g(k) - n * mean(i) * mean(j)) / (n - 1.0)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1; k += 1
      }
      i += 1
    }
    val (evals, v) = jacobiEigen(cov)
    val w = Array.ofDim[Double](dim, dim)
    i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        var acc = 0.0
        var m = 0
        while (m < dim) {
          acc += v(i)(m) * v(j)(m) / math.sqrt(math.max(evals(m), 0.0) + epsilon)
          m += 1
        }
        w(i)(j) = acc
        j += 1
      }
      i += 1
    }
    WhiteningModel(mean, w, evals)
  }

  /** Apply a whitening model: (idCol long, outCol array<double>) with
    * outCol = (x − mean)ᵀW. The model broadcasts (d² doubles — KB,
    * never data-sized); the multiply is one typed map pass, no
    * shuffle; join the result back on the id when the caller needs
    * the original columns alongside. */
  def whiten(df: DataFrame, idCol: String, vecCol: String,
      model: WhiteningModel, outCol: String = "whitened"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val dim = model.mean.length
    df.select(col(idCol).cast("long"),
        col(vecCol).cast(ArrayType(DoubleType)))
      .as[(Long, Seq[Double])]
      .map { case (id, xs) =>
        val m = bc.value
        require(xs != null && xs.length == dim,
          s"$vecCol must be non-null length-$dim")
        val x = xs.toArray
        val y = new Array[Double](dim)
        var j = 0
        while (j < dim) {
          var acc = 0.0
          var i = 0
          while (i < dim) { acc += (x(i) - m.mean(i)) * m.w(i)(j); i += 1 }
          y(j) = acc
          j += 1
        }
        (id, y.toSeq)
      }
      .toDF(idCol, outCol)
  }

  /** Fit + apply + CHECK in one call, emitting the oracled verdict
    * frame: exact integer facts (n, dim) and thresholded float
    * invariants — max |cov(whitened) − I| entry within `tol`, all
    * covariance eigenvalues non-negative (within −tol). One moment
    * pass to fit, one whitened moment pass to verify.
    *
    * @return rows (check string, pass boolean, detail long) ordered by
    *         check name */
  def whitenVerdict(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, tol: Double = 1e-6): DataFrame = {
    val spark = df.sparkSession
    val model = fitZcaWhitening(df, vecCol, dim)
    val whitened = whiten(df, idCol, vecCol, model, "__wh")
    val (n, s, g) = momentStats(whitened.select(col("__wh")), "__wh", dim)
    val mean = s.map(_ / n)
    var maxDev = 0.0
    var i = 0
    var k = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = (g(k) - n * mean(i) * mean(j)) / (n - 1.0)
        val target = if (i == j) 1.0 else 0.0
        maxDev = math.max(maxDev, math.abs(c - target))
        j += 1; k += 1
      }
      i += 1
    }
    val meanDev = mean.map(math.abs).max
    val minEig = model.eigvals.min
    import spark.implicits._
    Seq(
      ("cov_is_identity", maxDev <= tol, n),
      ("dim", true, dim.toLong),
      ("eigvals_nonneg", minEig >= -tol, n),
      ("mean_is_zero", meanDev <= tol, n),
      ("n_vectors", true, n),
    ).toDF("check", "pass", "detail")
  }
}
