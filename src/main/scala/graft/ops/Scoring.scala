package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Sketch  // md5_60: the one shared 60-bit hash def
import graft.ops.Materialize.MaterializeOps

// Top-level encoder row shapes — see the note in Multimodal.scala
// (Janino can't resolve object-nested classes from generated
// serializer code).
private[graft] case class LinearScoreRow(id: Long, n_tokens: Long,
    logit_milli: Long, score: Double)
private[graft] case class ImportanceRow(id: Long, n_tokens: Long,
    sum_target: Long, sum_raw: Long, importance: java.lang.Double)

/** Model-scoring operators: apply a (small, frozen) model to every
  * document of the corpus — the classifier/importance step between
  * heuristic filtering and training (CCNet's fastText language filter,
  * the GPT-3/LLaMA quality classifier, FineWeb-Edu's educational
  * scorer, DSIR's importance resampling all share this shape).
  *
  * The common scale pattern: the MODEL is a bounded artifact (a hashed
  * weight table / two bucket histograms) that rides to every task as
  * ONE broadcast array — the [[TextAnalysis.encodeTokens]] /
  * IVF-centroid bounded-collect pattern — and scoring is a pure
  * `mapPartitions` map over the corpus scan: no shuffle, no explode,
  * O(1) per token. Scores keep the repo's integer-exact idiom (integer
  * sums, IEEE arithmetic only in a final fixed-shape formula), so any
  * engine restates them bit-for-bit (q97/q98).
  */
object Scoring {

  /** The shared token → bucket map: md5-60 of the token mod `buckets`
    * (md5-60 is non-negative, so no sign fixup). Portable: any engine
    * computes CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % buckets. */
  /** Driver-local training gate for [[trainLinearHashed]]: engage the
    * in-memory loop only when BOTH the row count and the total token
    * count of the encoded sample fit — 32 M ints ≈ 128 MB collected,
    * the [[DriverGate.EdgeCap]] budget class. -1 forces distributed. */
  val LinearTrainTokenCap = 32000000L

  @inline private def bucketOf(tok: String, buckets: Int): Int =
    (Sketch.md5_60(UTF8String.fromString(tok)) % buckets).toInt

  /** Hashed-feature LINEAR classifier scoring — fastText's inference
    * shape: logit = bias + Σ_token w[h(token) mod D], normalized by
    * token count. Weights are integer PER-MILLE (a trained float model
    * quantizes into this — the q73 int8 trick applied to the
    * classifier), so the per-doc sum is an order-free exact integer and
    * the only IEEE step is one final division: score =
    * logit_milli / (1000 · max(n_tokens, 1)), restated bit-exactly by
    * any engine. Collisions are the standard hashing-trick tradeoff
    * (fastText ships with them too); `buckets` sizes the table.
    *
    * Scale shape: the weight table is D longs (model-sized — 8 MB at
    * D = 10⁶), broadcast once; scoring rides the corpus scan. No
    * shuffle anywhere.
    *
    * @param weights (bucket int, weight_milli long) — missing buckets
    *                weigh 0; out-of-range buckets rejected loudly
    * @return (idCol, n_tokens, logit_milli, score) */
  def scoreLinearHashed(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int, biasMilli: Long = 0L): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val w = new Array[Long](buckets)
    weights.select(col("bucket").cast("int"), col("weight_milli").cast("long"))
      .collect().foreach { r =>
        val b = r.getInt(0)
        require(b >= 0 && b < buckets,
          s"weight bucket $b outside [0, $buckets)")
        w(b) = r.getLong(1)
      }
    val bc = df.sparkSession.sparkContext.broadcast(w)
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)](enc)
      .mapPartitions { it =>
        val wt = bc.value
        val d = wt.length
        it.map { case (id, text) =>
          // null text scores like empty text instead of NPE-ing the scan
          val toks =
            if (text == null || text.trim.isEmpty) Array.empty[String]
            else text.trim.split("\\s+", -1)
          var acc = biasMilli
          var i = 0
          while (i < toks.length) {
            acc += wt(bucketOf(toks(i), d)); i += 1
          }
          LinearScoreRow(id, toks.length.toLong, acc,
            acc.toDouble / (1000.0 * math.max(toks.length, 1)))
        }
      }(Encoders.product[LinearScoreRow])
      .toDF(idCol, "n_tokens", "logit_milli", "score")
  }

  /** TRAIN the hashed linear classifier [[scoreLinearHashed]] applies —
    * the missing half of the CCNet/FineWeb loop (they train a fastText
    * classifier on curated-vs-raw samples, then score the corpus):
    * logistic regression on mean-pooled hashed bag-of-words features,
    * full-batch gradient descent with a fixed iteration count.
    *
    * Scale shape: documents are encoded ONCE into (label, bucket ids)
    * and materialized — each iteration is then one pass over the
    * compact encoded cache: broadcast the D-double weight vector,
    * `treeAggregate` the gradient (mergeable, map-side combined),
    * update on the driver (model-sized). In practice classifiers train
    * on a curated SAMPLE (10⁵–10⁶ docs), not the 100 TB corpus — the
    * corpus-sized pass is the APPLY side, which is why the returned
    * artifact is per-mille quantized to feed [[scoreLinearHashed]]
    * directly (the q73 int8 trick). Gradient float sums depend on
    * aggregation order, so the trained weights are deterministic only
    * to FP noise — q106 gates accuracy/loss verdicts on strongly
    * separable planted data (the q26/q33 convention), never raw
    * weights.
    *
    * @param labelCol 0.0/1.0 labels; rows with null label or text are
    *                 rejected loudly
    * @return ((bucket, weight_milli) frame for scoreLinearHashed,
    *         bias_milli, final mean log-loss) */
  def trainLinearHashed(df: DataFrame, textCol: String, labelCol: String,
      buckets: Int, iters: Int = 50, lr: Double = 1.0,
      localTokenCap: Long = LinearTrainTokenCap)
      : (DataFrame, Long, Double) = {
    require(buckets >= 1 && iters >= 1 && lr > 0,
      s"need buckets >= 1, iters >= 1, lr > 0; got $buckets/$iters/$lr")
    val spark = df.sparkSession
    val enc = Encoders.tuple(Encoders.scalaDouble,
      org.apache.spark.sql.Encoders.STRING)
    // encode once: (label, bucket ids of every token occurrence)
    val encoded = df.select(col(labelCol).cast("double"), col(textCol))
      .as[(Double, String)](enc)
      .map { case (y, text) =>
        require(y == 0.0 || y == 1.0, s"label must be 0/1, got $y")
        require(text != null, "null text cannot train")
        val toks = text.trim.split("\\s+", -1).filter(_.nonEmpty)
        (y, toks.map(t => bucketOf(t, buckets)))
      }(Encoders.tuple(Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.javaSerialization[Array[Int]]))
      .rdd
    encoded.localCheckpoint()
    val n = encoded.count()
    require(n > 0, "cannot train on an empty frame")

    var w = new Array[Double](buckets)
    var b = 0.0
    var loss = Double.NaN
    // one row's gradient contribution, SHARED by the distributed seqOp
    // and the driver-local loop below so the arithmetic can never
    // drift between the two paths: accumulates grad-w into `g` in
    // place, returns (d = p − y, the row's log-loss)
    @inline def rowGrad(y: Double, bs: Array[Int], wt: Array[Double],
        bias: Double, g: Array[Double]): (Double, Double) = {
      val m = bs.length.max(1).toDouble
      var z = bias
      var i = 0
      while (i < bs.length) { z += wt(bs(i)) / m; i += 1 }
      val p = 1.0 / (1.0 + math.exp(-z))
      val d = p - y
      i = 0
      while (i < bs.length) { g(bs(i)) += d / m; i += 1 }
      (d, -(y * math.log(p.max(1e-12)) +
        (1 - y) * math.log((1 - p).max(1e-12))))
    }
    // driver-local short-circuit (r14 — the DriverGate rationale
    // applied to the training loop): each full-batch pass is ONE
    // treeAggregate JOB over the encoded cache, so at sample sizes the
    // fixed job-launch cost dominates (q106: 60 jobs ≈ 1.6 s of wall
    // for 0.4 s of task work). Below the cap the encoded sample
    // collects once — one bounded job reading already-computed blocks,
    // Σ tokens ≤ 32 M ints ≈ 128 MB, the DriverGate budget class —
    // and the same per-row arithmetic runs in driver memory. Gradient
    // float sums depend on aggregation order EITHER way (the contract
    // above: weights are deterministic only to FP noise, callers gate
    // verdicts on separable data, never raw weights), so the gate
    // changes nothing a caller may rely on. localTokenCap = -1 forces
    // the distributed loop (the forced-distributed differential in
    // ScoringSpec); the distributed path is untouched and remains the
    // corpus-scale shape.
    val localRows: Option[Array[(Double, Array[Int])]] =
      if (localTokenCap >= 0 && n <= localTokenCap &&
          encoded.map(_._2.length.toLong).sum() <= localTokenCap)
        Some(encoded.collect())
      else None
    localRows match {
      case Some(rows) =>
        for (_ <- 1 to iters) {
          val g = new Array[Double](buckets)
          var g0 = 0.0
          var l = 0.0
          var r = 0
          while (r < rows.length) {
            val (y, bs) = rows(r)
            val (d, ll) = rowGrad(y, bs, w, b, g)
            g0 += d; l += ll; r += 1
          }
          var i = 0
          while (i < buckets) { w(i) -= lr * g(i) / n; i += 1 }
          b -= lr * g0 / n
          loss = l / n
        }
      case None =>
        for (_ <- 1 to iters) {
          val bcW = spark.sparkContext.broadcast(w)
          val bcB = b
          // (grad w, grad b, sum log-loss)
          val zeroG = (new Array[Double](buckets), 0.0, 0.0)
          val (gw, gb, sl) = encoded.treeAggregate(zeroG)(
            seqOp = { case ((g, g0, l), (y, bs)) =>
              val (d, ll) = rowGrad(y, bs, bcW.value, bcB, g)
              (g, g0 + d, l + ll)
            },
            combOp = { case ((g1, a1, l1), (g2, a2, l2)) =>
              var i = 0
              while (i < g1.length) { g1(i) += g2(i); i += 1 }
              (g1, a1 + a2, l1 + l2)
            })
          bcW.destroy()
          var i = 0
          while (i < buckets) { w(i) -= lr * gw(i) / n; i += 1 }
          b -= lr * gb / n
          loss = sl / n
        }
    }
    import spark.implicits._
    val weights = w.zipWithIndex
      .map { case (v, i) => (i, math.round(v * 1000)) }
      .toSeq.toDF("bucket", "weight_milli")
    (weights, math.round(b * 1000), loss)
  }

  /** DSIR-style IMPORTANCE weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each raw
    * document by how target-like its hashed unigram profile is, then
    * resample the corpus by the weight. DSIR proper uses a log-
    * likelihood ratio of smoothed hashed-n-gram models; this is the
    * integer-exact stand-in in the [[TextAnalysis.bigramFamiliarity]]
    * tradition — the ratio of the doc's MEAN target-bucket frequency to
    * its MEAN raw-bucket frequency, cross-multiplied so both sums stay
    * exact integers:
    *
    *   importance = (Σ_tok t[b(tok)] · R) / (Σ_tok r[b(tok)] · T)
    *
    * with t/r the target/raw bucket occurrence histograms and T/R their
    * totals. > 1 means the doc's vocabulary is over-represented in the
    * target; gibberish unseen in the target scores → 0. Every sum is an
    * exact integer; the two products and one division are fixed-shape
    * IEEE, so any engine restates the score bit-for-bit (q98).
    *
    * Scale shape: both histograms are map-side-combined aggs into D
    * bounded buckets (model-sized — the target corpus is the SMALL,
    * curated side by definition; the raw histogram is D longs no matter
    * the corpus size), broadcast once; scoring rides the raw scan. The
    * raw-side histogram pass is one extra corpus scan — at 100 TB,
    * amortize it across recipes by persisting the (bucket, count)
    * table next to the corpus.
    *
    * @return (idCol, n_tokens, sum_target, sum_raw, importance);
    *         zero-token docs score null with n_tokens 0 */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, targetTextCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = raw.sparkSession

    def histogram(df: DataFrame, c: String): Array[Long] = {
      val h = new Array[Long](buckets)
      df.select(explode(split(trim(col(c)), "\\s+")).as("__t"))
        .filter(col("__t") =!= "")
        .select((Dedup.md5Hash60(col("__t")) % buckets).cast("int").as("__b"))
        .groupBy(col("__b")).agg(count(lit(1)).as("__n"))
        .collect().foreach(r => h(r.getInt(0)) = r.getLong(1))
      h
    }

    val t = histogram(target, targetTextCol)
    val r = histogram(raw, textCol)
    val totalT = t.sum
    val totalR = r.sum
    require(totalT > 0, "target corpus has no tokens")
    require(totalR > 0, "raw corpus has no tokens")
    val bcT = spark.sparkContext.broadcast(t)
    val bcR = spark.sparkContext.broadcast(r)
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    raw.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)](enc)
      .mapPartitions { it =>
        val ht = bcT.value
        val hr = bcR.value
        val d = ht.length
        it.map { case (id, text) =>
          val toks =
            if (text == null || text.trim.isEmpty) Array.empty[String]
            else text.trim.split("\\s+", -1)
          var st = 0L
          var sr = 0L
          var i = 0
          while (i < toks.length) {
            val b = bucketOf(toks(i), d)
            st += ht(b); sr += hr(b); i += 1
          }
          // every raw token hits its own raw bucket, so sr > 0 whenever
          // the doc has tokens; the guard is for the zero-token case
          val imp: java.lang.Double =
            if (toks.isEmpty) null
            else Double.box((st.toDouble * totalR) / (sr.toDouble * totalT))
          ImportanceRow(id, toks.length.toLong, st, sr, imp)
        }
      }(Encoders.product[ImportanceRow])
      .toDF(idCol, "n_tokens", "sum_target", "sum_raw", "importance")
  }

  /** ROBUST per-group score normalization (median/MAD): z_robust =
    * (x − median_g) / MAD_g with MAD_g = median_g(|x − median_g|) — the
    * calibration step before cross-source score comparison or mixing
    * (a quality score of 0.7 means different things from different
    * scorers; mean/stddev normalization is itself skewed by the
    * outliers a quality score exists to flag).
    *
    * Integer-exact by construction for integer-valued scores: both
    * medians come from [[SketchStats.exactQuantilesLongByGroup]]'s
    * histogram-refinement selection (the rank-ceil(n/2) element — an
    * actual data value, never an interpolation), deviations are exact
    * integers, and the only IEEE op is the final single division — so
    * any engine restates the bits (q131). Float-valued scores should be
    * pre-quantized to integer micro-units (the q128 idiom).
    *
    * Scale shape: two grouped-quantile passes (each ≤ ~7 pruned scans
    * serving ALL groups at once, driver state = groups scalars,
    * 10⁴-guarded) + two null-safe joins of the groups-sized median/MAD
    * tables back onto the rows (AQE broadcasts them). No per-group
    * windows. A zero MAD (over half the group at the median) yields
    * null, not a division blow-up — documented, not silent: the
    * caller decides whether a degenerate stratum passes.
    *
    * @return input rows + `med`, `mad`, `robust_z` */
  def robustScaleByGroup(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    require(!df.columns.toSeq.intersect(Seq("med", "mad", "robust_z", "__ad"))
      .nonEmpty, "input must not already carry med/mad/robust_z/__ad")
    val meds = SketchStats
      .exactQuantilesLongByGroup(df, groupCol, valCol, Seq(0.5))
      .select(col(groupCol).as("__mg"), col("value").as("med"))
    val withMed = df.join(meds, col(groupCol) <=> col("__mg")).drop("__mg")
      .withColumn("__ad", abs(col(valCol).cast("long") - col("med")))
    val mads = SketchStats
      .exactQuantilesLongByGroup(withMed, groupCol, "__ad", Seq(0.5))
      .select(col(groupCol).as("__mg"), col("value").as("mad"))
    withMed.join(mads, col(groupCol) <=> col("__mg")).drop("__mg", "__ad")
      .withColumn("robust_z",
        when(col("mad") > 0L,
          (col(valCol).cast("long") - col("med")).cast("double") /
            col("mad").cast("double")))
  }

  /** PREFERENCE-PAIR construction for DPO/RLHF reward data — the step
    * after scoring candidate responses per prompt: within each group
    * (prompt), pair the best-scored candidate against the worst
    * (best-vs-worst, the max-margin construction used when K sampled
    * responses collapse to one training pair), emitting the pair only
    * when the score gap reaches `minMargin` (near-tied pairs teach
    * noise). Ties break to the LOWEST id on both sides, so the pair is
    * deterministic at any parallelism; scores are caller-provided
    * integers (milli-units — the repo's quantized-score idiom), so any
    * engine restates every pair and margin exactly (q146).
    *
    * Scale shape: ONE map-side-combined aggregation over the group key
    * — per-group state is two (score, id) extrema, no window, no
    * per-group sort, no candidate explosion. Groups with a single
    * candidate (best == worst) drop.
    *
    * @param scoreCol integer score column (cast to long internally)
    * @return (groupCol, chosen_id, rejected_id, chosen_score,
    *         rejected_score, score_margin) */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, minMargin: Long = 1L): DataFrame = {
    require(minMargin >= 0L, s"minMargin must be >= 0, got $minMargin")
    val sc = col(scoreCol).cast("long")
    val id = col(idCol).cast("long")
    // max over (score, -id): highest score, ties to lowest id;
    // min over (score, id): lowest score, ties to lowest id
    val best = max(struct(sc.as("s"), (-id).as("ni")))
    val worst = min(struct(sc.as("s"), id.as("i")))
    df.groupBy(col(groupCol))
      .agg(best.as("__b"), worst.as("__w"))
      .select(col(groupCol),
        (-col("__b.ni")).as("chosen_id"),
        col("__w.i").as("rejected_id"),
        col("__b.s").as("chosen_score"),
        col("__w.s").as("rejected_score"),
        (col("__b.s") - col("__w.s")).as("score_margin"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("score_margin") >= minMargin)
  }

  /** CCNet-style per-group QUALITY BUCKETS — the head/middle/tail cut
    * CCNet applies per language after LM scoring (Wenzek et al. 2020:
    * rank documents by model score within each language, split into
    * equal thirds; downstream pipelines keep head+middle or reweight
    * by bucket). Bucket 0 is the BEST `1/nBuckets` fraction.
    *
    * Integer-exact: per-group rank r (score desc, id asc — a total
    * order) and group size n give bucket = (r·nBuckets) div n, exact
    * integer math any engine restates (q156).
    *
    * Scale shape: NOT a per-group window — groups here are languages
    * (a handful), so a `Window.partitionBy(lang)` would funnel each
    * language's whole corpus through one task. Instead the
    * [[Packing.lengthBucketedBatches]] trick: ONE global
    * [[Packing.globalRowNumber]] two-pass scan over (group, score
    * desc, id), the per-group rank recovered by subtracting the
    * group's min rank from a group-count-sized broadcast aggregate.
    *
    * @return input columns + (bucket int, 0 = best fraction) */
  /** BM25 retrieval scoring (Robertson & Spärck Jones / the Okapi
    * formula, public knowledge) — score every document of the corpus
    * against one query: the retrieval primitive behind
    * retrieval-based decontamination, DSIR-style target selection,
    * and eval-neighborhood mining. Formula (k1 = k1Permille/1000,
    * b = bPermille/1000, dl = doc tokens, N docs, T total tokens):
    * {{{ score = Σ_t idf_t · tf·(1+k1) / (tf + k1·(1−b + b·dl·N/T)) }}}
    * with idf_t = floor(1000·ln((N − df_t + 0.5)/(df_t + 0.5) + 1))
    * — the milli-nat integer idf (the unigram-LM convention: ln is
    * the one libm call; flooring to milli-nats makes a last-ulp libm
    * difference visible only when the value sits within ~2 ulp of an
    * integer boundary). Every per-term score is floored to integer
    * MICRO-units after a PINNED IEEE op sequence over exact integer
    * inputs — (idf_mn·1000.0)·(tf·(1.0+k1)) / (tf + k1·((1−b) +
    * b·(dl·N/T))) — so the final per-doc score is an order-free
    * integer sum any engine restates bit-for-bit (q166).
    *
    * Scale shape: ONE corpus stats pass (N, T — a 1-row collect), tf
    * restricted to the query's terms BEFORE the aggregation (the
    * explode filters against a query-sized literal, so the shuffle
    * carries only matching postings), query-sized df/idf stats
    * broadcast back, and a final key join re-attaching zero-match
    * docs. Nothing corpus-sized ever reaches the driver.
    *
    * @return (idCol, dl, n_matched, score_micro) for EVERY input doc
    */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1Permille: Int = 1200,
      bPermille: Int = 750): DataFrame = {
    require(queryTerms.nonEmpty, "query must have at least one term")
    require(k1Permille >= 0 && bPermille >= 0 && bPermille <= 1000,
      s"need k1Permille >= 0 and bPermille in [0,1000], " +
        s"got $k1Permille/$bPermille")
    val terms = queryTerms.distinct.sorted
    val toks = df.select(col(idCol),
      split(trim(coalesce(col(textCol), lit(""))), "\\s+").as("__w"))
    val dl = toks.select(col(idCol), size(col("__w")).cast("long").as("dl"))
    // corpus stats: one aggregated row — bounded by construction
    val st = dl.agg(count(lit(1)).cast("long").as("n"),
      sum(col("dl")).cast("long").as("t")).collect()(0)
    val nDocs = st.getLong(0)
    val tToks = st.getLong(1)
    val k1 = k1Permille / 1000.0
    val b = bPermille / 1000.0
    val tf = toks.select(col(idCol), explode(col("__w")).as("__tok"))
      .filter(col("__tok").isin(terms: _*))
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).cast("long").as("__tf"))
    val idf = tf.groupBy(col("__tok"))
      .agg(count(lit(1)).cast("long").as("__df"))
      .withColumn("__idf_mn",
        floor(lit(1000.0) * log(
          (lit(nDocs.toDouble) - col("__df") + lit(0.5)) /
            (col("__df") + lit(0.5)) + lit(1.0))).cast("long"))
      .select(col("__tok"), col("__idf_mn"))
    val perTerm = tf
      .join(broadcast(idf), "__tok")
      .join(dl, idCol)
      .withColumn("__m",
        floor((col("__idf_mn").cast("double") * lit(1000.0)) *
          (col("__tf").cast("double") * lit(1.0 + k1)) /
          (col("__tf").cast("double") + lit(k1) * (lit(1.0 - b) +
            lit(b) * ((col("dl") * nDocs).cast("double") /
              lit(tToks.toDouble))))).cast("long"))
    val agged = perTerm.groupBy(col(idCol))
      .agg(sum(col("__m")).as("__score"),
        count(lit(1)).cast("long").as("__matched"))
    dl.join(agged, Seq(idCol), "left")
      .select(col(idCol), col("dl"),
        coalesce(col("__matched"), lit(0L)).as("n_matched"),
        coalesce(col("__score"), lit(0L)).as("score_micro"))
  }

  def qualityBuckets(df: DataFrame, idCol: String, scoreCol: String,
      groupCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val ranked = Packing.globalRowNumber(df,
      Seq(col(groupCol).asc, col(scoreCol).desc, col(idCol).asc),
      "__rank")
    val stats = ranked.groupBy(col(groupCol))
      .agg(min(col("__rank")).as("__min"), count(lit(1)).as("__n"))
    ranked.join(broadcast(stats), groupCol)
      .withColumn("bucket",
        expr(s"((__rank - __min) * $nBuckets) div __n").cast("int"))
      .drop("__rank", "__min", "__n")
  }

  /** COPELAND ranking of preference data (Copeland 1951, the
    * tournament method — public): given pairwise preference judgments
    * (winner, loser) per prompt group, score every candidate by
    * `wins − losses` and rank within its group — the exact integer
    * alternative to Bradley–Terry fitting for preference-data health
    * checks (which responses dominate, which judgments cycle). Ties
    * rank together via dense rank on the integer score; a candidate
    * judged both ways against the same rival accumulates both
    * outcomes (Copeland over the MULTISET of judgments).
    *
    * Scale shape: two map-side-combined counts (wins by winner,
    * losses by loser) union-summed on the (group, candidate) key, one
    * group-partitioned dense-rank window (groups are prompt-sized).
    *
    * @param prefs (groupCol, winnerCol, loserCol) one row per judgment
    * @return (groupCol, candidate, wins, losses, copeland, rank) */
  def copelandRanking(prefs: DataFrame, groupCol: String,
      winnerCol: String, loserCol: String): DataFrame = {
    val wins = prefs.groupBy(col(groupCol),
        col(winnerCol).as("candidate"))
      .agg(count(lit(1)).as("wins"))
    val losses = prefs.groupBy(col(groupCol),
        col(loserCol).as("candidate"))
      .agg(count(lit(1)).as("losses"))
    val scored = wins.join(losses, Seq(groupCol, "candidate"), "full")
      .select(col(groupCol), col("candidate"),
        coalesce(col("wins"), lit(0L)).as("wins"),
        coalesce(col("losses"), lit(0L)).as("losses"))
      .withColumn("copeland", col("wins") - col("losses"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("copeland").desc)
    scored.withColumn("rank", dense_rank().over(w))
  }

  /** K-ANONYMITY release gate (Sweeney 2002, public) for aggregate
    * publishing: a released statistics row whose underlying group has
    * fewer than `k` members re-identifies its contributors, so it is
    * SUPPRESSED (dropped) rather than published — the standard
    * small-cell rule of data cards and statistical releases. Returns
    * the surviving aggregate plus a suppression audit count so the
    * release NAMES what it withheld (silent suppression reads as
    * coverage — the no-silent-caps rule).
    *
    * @return (groupCols..., group_n, released boolean) — every group
    *         present, small ones flagged released = false so callers
    *         publish `filter(released)` and report the rest */
  def kAnonymityGate(df: DataFrame, groupCols: Seq[String],
      k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "need at least one grouping column")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("released", col("group_n") >= k)
  }

  /** SEEDED-NOISE COUNT RELEASE — the second half of the release-gate
    * family ([[kAnonymityGate]] suppresses small cells; this perturbs
    * the published counts of the surviving cells). Noise is drawn
    * deterministically per cell from `md5(groupKey || seed)` and is
    * uniform on the integer range [-bound, +bound] (a randomized-
    * response-style bounded mechanism — NOT a calibrated Laplace/DP
    * release; a geometric-tailed sampler would slot into the same
    * `__noise` column, and the uniform draw here is the honest,
    * replayable-by-any-engine baseline). Published counts clamp at 0
    * (a negative count is not a count).
    *
    * Determinism is the point: a release is an auditable artifact, so
    * the noise must be a pure function of (cell, seed) — rerunning the
    * release, at any parallelism or on any engine that can md5, yields
    * byte-identical numbers (same construction as the sampling family's
    * md5-60 ranks).
    *
    * Scale shape: one map-side-combined aggregation; the noise is a
    * per-group scalar expression on the |groups|-sized result.
    *
    * @return (groupCols..., group_n true count, noise, released_n
    *         clamped noisy count, released flag) — callers publish
    *         `filter(released).select(..., released_n)` and keep the
    *         full frame as the private audit trail */
  def seededNoiseRelease(df: DataFrame, groupCols: Seq[String],
      seed: String, bound: Int, k: Long = 1): DataFrame = {
    require(bound >= 1, s"bound must be >= 1, got $bound")
    val gated = kAnonymityGate(df, groupCols, k)
    // each key column null-coalesces to a sentinel BEFORE concat:
    // concat_ws would silently SKIP a null (colliding "a"+null with
    // "a" and diverging from any null-propagating SQL restatement),
    // so a null group key gets its own well-defined noise instead —
    // oracles restate coalesce(CAST(c AS VARCHAR), '<null>')
    val key = concat_ws("",
      groupCols.map(c =>
        coalesce(col(c).cast("string"), lit("<null>"))) :+ lit(seed): _*)
    gated
      .withColumn("noise",
        (Dedup.md5Hash60(key) % lit(2 * bound + 1)).cast("long")
          - lit(bound.toLong))
      .withColumn("released_n",
        greatest(col("group_n") + col("noise"), lit(0L)))
  }

  /** BRADLEY–TERRY strengths via the MM algorithm (Hunter 2004), the
    * model-based companion to [[copelandRanking]]'s tournament counts:
    * p_i' = W_i / Σ_j n_ij/(p_i + p_j), run a FIXED number of
    * iterations in integer milli-strengths with truncating division —
    * the quantized-k-means convention (q113): not the float fixpoint,
    * but a deterministic integer recurrence any engine replays
    * bit-for-bit, converging to the same ordering in practice (rank
    * gates, not raw strengths, are what downstream consumes).
    *
    * Scale shape: pair stats are one map-side-combined aggregation off
    * the judgment stream; each iteration is candidate×opponent-sized
    * joins over MODEL-SIZED frames (candidate sets are prompt-sized —
    * the q188 contract), materialized per round so lineage stays O(1).
    * The final rank is 1 + |{j : p_j > p_i}| (SQL rank() semantics)
    * from a broadcast self-comparison — no unpartitioned window.
    *
    * Zero-win candidates reach strength 0; a pair of zero-strength
    * opponents divides by greatest(p_i+p_j, 1) so the recurrence never
    * nulls. Malformed judgments drop up front: a null winner or loser
    * would otherwise collapse into a phantom self-game (`least`/
    * `greatest` skip nulls, so (null, A) becomes the pair (A, A)),
    * and an explicit winner == loser row is equally meaningless to
    * the model.
    *
    * @return (candidate, wins, games, strength_milli, rank) */
  def bradleyTerry(rawPrefs: DataFrame, winnerCol: String,
      loserCol: String, iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters must be in [1,8], got $iters")
    import Materialize.MaterializeOps
    val prefs = rawPrefs.filter(col(winnerCol).isNotNull &&
      col(loserCol).isNotNull && col(winnerCol) =!= col(loserCol))
    val pairs = prefs.select(
        least(col(winnerCol), col(loserCol)).as("lo"),
        greatest(col(winnerCol), col(loserCol)).as("hi"))
      .groupBy(col("lo"), col("hi")).agg(count(lit(1)).as("n_games"))
      .materialized // reused every iteration
    val dir = pairs
      .select(col("lo").as("cand"), col("hi").as("opp"), col("n_games"))
      .unionByName(pairs
        .select(col("hi").as("cand"), col("lo").as("opp"),
          col("n_games")))
    val wins = prefs.groupBy(col(winnerCol).as("cand"))
      .agg(count(lit(1)).as("wins"))
    val games = dir.groupBy(col("cand")).agg(sum(col("n_games")).as("games"))
    var p = prefs.select(col(winnerCol).as("cand"))
      .unionByName(prefs.select(col(loserCol).as("cand"))).distinct()
      .join(wins, Seq("cand"), "left")
      .select(col("cand"), coalesce(col("wins"), lit(0L)).as("wins"),
        lit(1000L).as("p"))
      .materialized
    for (_ <- 1 to iters) {
      val d = dir
        .join(p.select(col("cand"), col("p")), "cand")
        .join(p.select(col("cand").as("opp"), col("p").as("p_opp")),
          "opp")
        .withColumn("__t",
          expr("(n_games * 1000000) div greatest(p + p_opp, 1)"))
        .groupBy(col("cand")).agg(sum(col("__t")).as("__d"))
      p = p.drop("p").join(d, Seq("cand"), "left")
        .withColumn("p", expr(
          "CASE WHEN __d IS NULL OR __d = 0 THEN 0" +
            " ELSE (wins * 1000000) div __d END"))
        .drop("__d")
        .materialized
    }
    val strengths = p.join(games, Seq("cand"), "left")
      .select(col("cand").as("candidate"), col("wins"),
        coalesce(col("games"), lit(0L)).as("games"),
        col("p").as("strength_milli"))
    // rank() semantics without an unpartitioned window: candidates are
    // model-sized by contract, so the comparison side broadcasts
    val cmp = broadcast(strengths
      .select(col("strength_milli").as("__p2")))
    strengths.join(cmp, col("__p2") > col("strength_milli"), "left")
      .groupBy(col("candidate"), col("wins"), col("games"),
        col("strength_milli"))
      .agg((count(col("__p2")) + 1).cast("int").as("rank"))
  }

  /** Position-decay weight table in integer ppb:
    * `w(j) = floor(10⁹ · α · (1−α)^j)`, j = 0..k−1 — computed ONCE
    * driver-side and injected as literals into both the scoring
    * expression and the oracle SQL (the [[ndcgWeights]] convention:
    * the engines share exact integers BY CONSTRUCTION, no cross-libm
    * pow in the compared projection). */
  def decayWeights(k: Int, alphaPermille: Int): Seq[Long] = {
    require(k >= 1 && alphaPermille >= 1 && alphaPermille <= 1000,
      s"need k >= 1, alphaPermille in [1,1000]; got $k/$alphaPermille")
    val a = alphaPermille / 1000.0
    (0 until k).map(j => math.floor(1e9 * a * math.pow(1 - a, j)).toLong)
  }

  /** EXPONENTIALLY-DECAYED engagement score over each key's most
    * recent k events — the recency-weighted feature every ranking /
    * user-model pipeline derives (EWMA truncated at k so the result is
    * exact and replayable: the infinite-tail EWMA is an
    * order-dependent float fold that no second engine restates
    * bit-for-bit). Events rank newest-first by (tsCol, tieCol) — the
    * unique tiebreak pins rank j, weight [[decayWeights]](j) rides in
    * as a literal array, and the score is the exact integer
    * Σ value_scaled(j)·w(j) (`decayed_num`, value-scaled·ppb) with a
    * convenience `decayed_milli = decayed_num div 10⁶`
    * (value-scaled·milli).
    *
    * Scale shape: one window partitioned by the key (keys numerous),
    * filter to k rows, one map-side-combined sum.
    *
    * Events with a null ts or null value drop before ranking (see the
    * in-body note — n_used and decayed_num must describe the same
    * rows).
    *
    * @param valueScaledCol integer-scaled value (cents — the
    *        [[groupedOls]] contract)
    * @return (keyCol, n_used, decayed_num, decayed_milli) */
  def decayedScore(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueScaledCol: String, k: Int,
      alphaPermille: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val wt = decayWeights(k, alphaPermille)
    val wArr = array(wt.map(lit): _*)
    // a null ts or value would otherwise occupy one of the k recency
    // slots while contributing nothing to the sum (sum skips nulls,
    // row_number does not) — n_used and decayed_num must describe the
    // same rows
    df.filter(col(tsCol).isNotNull && col(valueScaledCol).isNotNull)
      .withColumn("__j", row_number().over(w))
      .filter(col("__j") <= k)
      .withColumn("__wt", element_at(wArr, col("__j")))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_used"),
        sum(col(valueScaledCol).cast("long") * col("__wt"))
          .as("decayed_num"))
      .withColumn("decayed_milli", expr("decayed_num div 1000000"))
  }

  /** GINI CONCENTRATION of a positive size column — "how concentrated
    * is the corpus across sources" in one exact integer: with sizes
    * sorted ascending and 1-based rank i,
    * `G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)`, published in ppm. The rank
    * is [[Packing.globalRowNumber]]'s two-pass distributed scan
    * (tie-broken by the id column so every engine ranks identically);
    * sums accumulate in decimal(38,0).
    *
    * @return one row (n, total, gini_ppm) — null gini on an empty or
    *         zero-total frame (undefined, not zero); null sizes drop
    *         before ranking (see the in-body note) */
  def giniConcentration(df: DataFrame, valueCol: String,
      idCol: String): DataFrame = {
    // null sizes would take ranks (nulls-first in the asc sort) while
    // the sums skip them, skewing the rank-weighted identity — a null
    // size is "unmeasured", not a size, so it drops before ranking
    val ranked = Packing.globalRowNumber(
      df.filter(col(valueCol).isNotNull)
        .select(col(valueCol).cast("decimal(38,0)").as("__x"),
          col(idCol).as("__id")),
      Seq(col("__x").asc, col("__id").asc), "__r")
    ranked
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("total"),
        sum((col("__r") + 1) * col("__x")).as("__ix"))
      .withColumn("gini_ppm", expr(
        """CASE WHEN n = 0 OR total = 0 THEN NULL
          |ELSE CAST((1000000 * (2 * __ix - (n + 1) * total))
          |  div (n * total) AS BIGINT) END""".stripMargin))
      .select(col("n"), col("total").cast("long").as("total"),
        col("gini_ppm"))
  }

  /** CHI-SQUARE INDEPENDENCE cells for two label columns — the
    * distribution-shift / association audit next to [[cohenKappa]]
    * (kappa asks "do they agree", χ² asks "are they independent").
    * Emitted PER CELL in exact integer ppm —
    * `contrib = (O·n − r·c)² / (n·r·c)` — over the FULL label cross
    * product (zero-observed cells included: their contribution is
    * exactly r·c/n², and dropping them understates the statistic);
    * the consumer sums `chi2_ppm` for the total. Per-cell rows stay
    * exact where a float Σ over cells would be order-dependent.
    * Precision envelope: (O·n)² inside decimal(38,0) needs n ≲ 10⁹
    * rows; beyond that publish the cells and finish in wider
    * arithmetic.
    *
    * @return (aCol, bCol, observed, r_total, c_total, expected_milli,
    *         chi2_ppm) */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val labeled = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
    val obs = labeled.groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("observed"))
    val ra = labeled.groupBy(col("__a")).agg(count(lit(1)).as("r_total"))
    val rb = labeled.groupBy(col("__b")).agg(count(lit(1)).as("c_total"))
    val n = labeled.agg(count(lit(1)).as("__n"))
    ra.crossJoin(rb) // full label cross product — zero cells included
      .join(obs, Seq("__a", "__b"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("expected_milli",
        expr("(1000 * r_total * c_total) div __n"))
      .withColumn("chi2_ppm", expr(
        """CAST((1000000 * CAST(observed * __n - r_total * c_total
          |    AS DECIMAL(38,0))
          |  * CAST(observed * __n - r_total * c_total AS DECIMAL(38,0)))
          |  div (CAST(__n AS DECIMAL(38,0)) * r_total * c_total)
          |  AS BIGINT)""".stripMargin))
      .select(col("__a").as(aCol), col("__b").as(bCol), col("observed"),
        col("r_total"), col("c_total"), col("expected_milli"),
        col("chi2_ppm"))
  }

  /** COHEN'S KAPPA — chance-corrected agreement between two label
    * columns (two annotators, or model vs human, on the same rows):
    * the QA statistic every labeling/preference pipeline publishes
    * before trusting its annotations (Cohen 1960; Artstein & Poesio
    * 2008 survey). Exact integer end to end via the cross-multiplied
    * form κ = (n·n_agree − Σ_c r_c·s_c) / (n² − Σ_c r_c·s_c) — the
    * marginal products Σ r·s computed from two label-count aggregates
    * joined on the label; the one-row final formula runs in
    * decimal(38,0) (n² overflows long past ~3·10⁹ rows) and publishes
    * ppm. Rows where either side is null are excluded (unlabeled, not
    * disagreement); κ is null when the denominator is 0 (both sides
    * constant and identical — agreement is undefined, not perfect).
    *
    * Scale shape: three map-side-combined aggregations over one scan
    * shape + a |labels|-sized join; everything after is one row.
    *
    * @return one row: (n, n_agree, sum_marginal, kappa_ppm) */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val labeled = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val totals = labeled.agg(count(lit(1)).as("n"),
      sum((col(aCol) === col(bCol)).cast("long")).as("n_agree"))
    val ra = labeled.groupBy(col(aCol).cast("string").as("__l"))
      .agg(count(lit(1)).as("__ra"))
    val rb = labeled.groupBy(col(bCol).cast("string").as("__l"))
      .agg(count(lit(1)).as("__rb"))
    // inner join: a label missing on either side contributes 0
    val marg = ra.join(rb, "__l")
      .agg(coalesce(sum(col("__ra") * col("__rb")), lit(0L))
        .as("sum_marginal"))
    totals.crossJoin(marg)
      .withColumn("kappa_ppm", expr(
        """CASE WHEN CAST(n AS DECIMAL(38,0)) * n - sum_marginal = 0
          |  THEN NULL
          |  ELSE CAST((1000000 * (CAST(n AS DECIMAL(38,0)) * n_agree
          |      - sum_marginal))
          |    div (CAST(n AS DECIMAL(38,0)) * n - sum_marginal)
          |    AS BIGINT)
          |END""".stripMargin))
  }

  /** PERCENTILE RANK within a group — rank-based score calibration
    * (the first half of quantile normalization): a raw score becomes
    * its exact position in the group's order, in integer per-mille
    * `((rank − 1) · 1000) div (n_group − 1)`, so scores from sources
    * with incomparable scales become comparable before mixing or
    * thresholding. Ties broken by the unique `idCol` (two engines
    * must agree on every rank). Singleton groups sit at 0 by the
    * formula's convention. Null scores are KEPT: they sort first
    * (asc nulls-first) and take the lowest ranks deterministically —
    * filter upstream if null means "unscored" rather than "worst".
    *
    * Scale shape: one window partitioned by the group key — groups are
    * numerous (sources, languages), so the sort parallelizes; for a
    * GLOBAL percentile use [[SketchStats.globalNtile]]'s two-pass rank
    * instead of an unpartitioned window.
    *
    * @return input + (group_rank long 1-based, pct_pm long 0..1000) */
  def percentileRankByGroup(df: DataFrame, groupCol: String,
      valueCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    df.withColumn("group_rank", row_number().over(w).cast("long"))
      .withColumn("__ng", count(lit(1)).over(wAll))
      .withColumn("pct_pm",
        when(col("__ng") === 1, lit(0L))
          .otherwise(expr("((group_rank - 1) * 1000) div (__ng - 1)")))
      .drop("__ng")
  }

  /** DISTRIBUTION-DRIFT REPORT — the corpus-monitoring twin of the
    * data card: bucket a numeric column on both sides of a comparison
    * (yesterday's snapshot vs today's, source A vs source B), publish
    * per-bucket counts and per-mille shares, and the per-bucket share
    * gap. `sum(abs_gap_pm) / 2` over the report is total variation
    * distance in per-mille — the drift alarm threshold — computable by
    * the consumer with one further aggregate; shares are exact integer
    * per-mille (`(n · 1000) div total`) so two engines agree bitwise.
    *
    * Scale shape: two map-side-combined bucket aggregations (shuffle =
    * |buckets| rows each) + a full-outer join of two tiny frames. The
    * full-outer keeps buckets present on only one side (share 0 on the
    * other) — dropping them would hide exactly the drift being
    * measured.
    *
    * @param bucketWidth integer bucket = `value div bucketWidth`
    * @return (bucket, n_a, n_b, share_a_pm, share_b_pm, abs_gap_pm) */
  def histogramDrift(a: DataFrame, b: DataFrame, valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    def side(df: DataFrame, n: String): DataFrame = {
      val bucketed = df
        .select(expr(s"$valueCol div $bucketWidth").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(n))
      // total via window-free scalar: |buckets| is tiny, broadcast it
      bucketed.crossJoin(
          broadcast(bucketed.agg(sum(col(n)).as(s"__t_$n"))))
        .withColumn(s"share_${n.stripPrefix("n_")}_pm",
          expr(s"($n * 1000) div __t_$n"))
        .drop(s"__t_$n")
    }
    side(a, "n_a").join(side(b, "n_b"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("share_a_pm"), lit(0L)).as("share_a_pm"),
        coalesce(col("share_b_pm"), lit(0L)).as("share_b_pm"))
      .withColumn("abs_gap_pm", abs(col("share_a_pm") - col("share_b_pm")))
  }

  /** The NDCG position-discount table in integer ppb:
    * `w(i) = floor(1e9 / log2(i + 1))`, i = 1..k. Computed ONCE here
    * (driver-side libm) and injected as literals into both the metric
    * expression and q186's oracle SQL — the two engines share the
    * exact integers BY CONSTRUCTION, so no cross-libm log2 ever
    * enters the compared projection. */
  def ndcgWeights(k: Int): Seq[Long] =
    (1 to k).map(i =>
      math.floor(1e9 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** RETRIEVAL METRICS — MRR and NDCG@k (Järvelin & Kekäläinen 2002,
    * public), the report card of every search/ANN/BM25 stack in this
    * file: given per-query rankings with binary relevance and the
    * per-query relevant-total, emit the standard metrics in EXACT
    * integer arithmetic — `mrr_ppb = 1e9 div first_rel_rank`,
    * `ndcg_ppm = (1e6 · dcg) div idcg` over the injected
    * [[ndcgWeights]] integers (idcg = the prefix sum at
    * min(k, n_relevant)). Queries with no relevant hit in the top-k
    * score 0 with null first_rel_rank; queries with n_relevant = 0
    * score null ndcg (undefined by the metric).
    *
    * Scale shape: one map-side-combined per-query aggregation over
    * the ranking rows ≤ k (element_at against the k-sized literal
    * weight arrays — no join for the weights), plus one broadcast-free
    * key join for the totals.
    *
    * @param ranked (qCol, rankCol 1-based, relCol boolean)
    * @param totals (qCol, n_relevant)
    * @return (qCol, n_relevant, n_hits_at_k, first_rel_rank,
    *         mrr_ppb, ndcg_ppm) */
  def retrievalMetrics(ranked: DataFrame, qCol: String, rankCol: String,
      relCol: String, totals: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = ndcgWeights(k)
    val cum = w.scanLeft(0L)(_ + _).tail // prefix sums, 1-based
    val wArr = array(w.map(lit): _*)
    val hit = col(relCol) && col(rankCol) <= k
    val perQ = ranked.groupBy(col(qCol))
      .agg(
        sum(when(hit, lit(1L)).otherwise(lit(0L))).as("n_hits_at_k"),
        min(when(col(relCol), col(rankCol).cast("long")))
          .as("first_rel_rank"),
        sum(when(hit,
          element_at(wArr, col(rankCol).cast("int")))
          .otherwise(lit(0L))).as("__dcg"))
    totals.join(perQ, Seq(qCol), "left")
      .select(col(qCol), col("n_relevant").cast("long").as("n_relevant"),
        coalesce(col("n_hits_at_k"), lit(0L)).as("n_hits_at_k"),
        col("first_rel_rank"),
        coalesce(expr("1000000000L div first_rel_rank"), lit(0L))
          .as("mrr_ppb"),
        when(col("n_relevant") === 0, lit(null)).otherwise(
          expr(s"(1000000L * coalesce(__dcg, 0L)) div " +
            s"element_at(${cumArrSql(cum)}, " +
            s"CAST(least($k, n_relevant) AS INT))")).as("ndcg_ppm"))
  }

  private def cumArrSql(cum: Seq[Long]): String =
    cum.mkString("array(", "L, ", "L)")

  /** DoReMi-style DOMAIN REWEIGHTING (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    * public): the exponentiated-gradient update over per-step
    * per-domain excess losses, offline — the proxy-model training
    * that PRODUCES those losses is a GPU job outside an analytics
    * engine; this operator is the mixture-math half a pipeline runs
    * on the measured loss table. In log space the per-step updates
    * telescope (per-step renormalization is a constant shift softmax
    * ignores), so the whole run is ONE exact integer:
    * {{{ lw_micro = (etaPermille · Σ_steps meanExcess_micro) div 1000 }}}
    * with meanExcess_micro = per-(domain, step) integer-mean of the
    * row losses (`sum div count`). Those integers plus the (lw desc,
    * domain asc) rank are the compared projection; `alpha_ppm` — the
    * smoothed softmax α = (1−s)·softmax(lw) + s/k the trainer would
    * consume — is a FLOAT TRANSCENDENTAL and therefore a human/
    * threshold column, never cross-engine hashed (the q137
    * perplexity convention; its ORDERING is pinned by `rank`, which
    * IS compared).
    *
    * Scale shape: rows aggregate map-side to (domain, step) then to
    * domain — the output is domain-count-sized, so the final rank
    * rides [[Packing.globalRowNumber]]'s two-pass scan and the
    * softmax normalizer is one domain-sized aggregate, not a
    * collect.
    *
    * @param df rows of (domainCol, stepCol, excessCol: long
    *           micro-nat excess loss, may be negative)
    * @return (domain, n_steps, sum_excess_micro, lw_micro, rank,
    *         alpha_ppm) — one row per domain */
  def domainReweight(df: DataFrame, domainCol: String, stepCol: String,
      excessCol: String, etaPermille: Int = 100,
      smoothingPermille: Int = 10): DataFrame = {
    require(etaPermille >= 1, s"etaPermille must be >= 1, got $etaPermille")
    require(smoothingPermille >= 0 && smoothingPermille <= 1000,
      s"smoothingPermille must be in [0,1000], got $smoothingPermille")
    val perStep = df.groupBy(col(domainCol), col(stepCol))
      .agg(expr(s"sum($excessCol) div count(1)").as("__mean"))
    val perDomain = perStep.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_steps"),
        sum(col("__mean")).as("sum_excess_micro"))
      .withColumn("lw_micro",
        expr(s"($etaPermille * sum_excess_micro) div 1000"))
    val ranked = Packing.globalRowNumber(perDomain,
      Seq(col("lw_micro").desc, col(domainCol).asc), "__r")
      .withColumn("rank", (col("__r") + 1).cast("int")).drop("__r")
    // human/threshold softmax: exp shifted by the max for stability;
    // k and the normalizer are domain-sized aggregates
    val stats = ranked.agg(max(col("lw_micro")).as("__mx"),
      count(lit(1)).as("__k"))
    val withExp = ranked.crossJoin(broadcast(stats))
      .withColumn("__e",
        exp((col("lw_micro") - col("__mx")).cast("double") / 1e6))
    val z = withExp.agg(sum(col("__e")).as("__z"))
    withExp.crossJoin(broadcast(z))
      .withColumn("alpha_ppm",
        floor(lit(1000000.0) *
          ((lit(1.0 - smoothingPermille / 1000.0)) * col("__e") / col("__z")
            + lit(smoothingPermille / 1000.0) / col("__k"))).cast("long"))
      .select(col(domainCol), col("n_steps"), col("sum_excess_micro"),
        col("lw_micro"), col("rank"), col("alpha_ppm"))
  }

  /** Quantile normalization across groups: replace each row's value
    * with the GLOBAL distribution's value at the same within-group
    * rank fraction, so every group's scores land on one common scale.
    * The cross-source calibration step before a single quality
    * threshold is applied to heterogeneous sources — a length-quality
    * score from a forum dump and one from curated news are not
    * comparable until both are mapped onto the pooled distribution
    * (Bolstad et al. 2003's microarray trick, applied corpus-side).
    *
    * Exactness: everything is integer rank arithmetic. Within-group
    * rank r ∈ [1..n] (ties broken by the id column — bit-stable), the
    * target global rank is 1 + ((r−1)·(N−1)) div (n−1) for n > 1 (the
    * endpoints map to the global min/max; n = 1 maps to the global
    * median rank (N+1) div 2), and the normalized value is the global
    * order statistic AT that rank — an equi-join against the globally
    * ranked frame, no interpolation, no floats.
    *
    * Scale shape: the within-group rank is a window partitioned by the
    * group key; the global ranking is [[Packing.globalRowNumber]]'s
    * two-pass range-partitioned scan (never a single-partition
    * window); the final lookup is a shuffle join on the integer rank.
    *
    * @return input columns + group_rank, group_n, normalized (long) */
  /** Right-to-be-forgotten propagation report: given a tombstone list
    * of subject keys, count per table how many rows the purge removes
    * and how many survive — the audit a deletion pipeline publishes
    * BEFORE the destructive anti-join runs (and the same frame the
    * post-purge run re-emits with n_purged = 0 as proof of
    * completion). One job: every table contributes only its (name,
    * key) projection to a union, the tombstone set broadcasts (a
    * deletion batch is model-sized by nature), and the counts
    * aggregate map-side — no table is scanned twice, no full rows
    * move.
    *
    * @param tables (table name, frame, subject-key column) triples
    * @return (table_name, n_before, n_purged, n_after) */
  def deletionPropagation(tables: Seq[(String, DataFrame, String)],
      tombstones: DataFrame, tombKeyCol: String): DataFrame = {
    require(tables.nonEmpty, "need at least one table")
    require(tables.map(_._1).distinct.size == tables.size,
      "duplicate table names")
    val keys = tables.map { case (name, df, kc) =>
      df.select(lit(name).as("table_name"),
        col(kc).cast("long").as("__k"))
    }.reduce(_ unionByName _)
    val tomb = broadcast(tombstones
      .select(col(tombKeyCol).cast("long").as("__k"))
      .distinct().withColumn("__dead", lit(1L)))
    keys.join(tomb, Seq("__k"), "left")
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_before"),
        sum(coalesce(col("__dead"), lit(0L))).as("n_purged"))
      .withColumn("n_after", col("n_before") - col("n_purged"))
  }

  def quantileNormalize(df: DataFrame, groupCol: String, valCol: String,
      idCol: String): DataFrame = {
    val ranked = Packing.globalRowNumber(df,
      Seq(col(valCol).asc, col(idCol).asc), "__g")
      .withColumn("__grank", col("__g") + 1).drop("__g")
      .materialized
    val n = ranked.agg(count(lit(1))).head().getLong(0)
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(valCol).asc, col(idCol).asc)
    val withRanks = ranked
      .withColumn("group_rank", row_number().over(byGroup).cast("long"))
      .withColumn("group_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol))))
      .withColumn("__target",
        when(col("group_n") === 1L, lit((n + 1) / 2))
          .otherwise(lit(1L) + expr(
            s"((group_rank - 1) * ${n - 1}L) div (group_n - 1)")))
    val lookup = ranked
      .select(col("__grank").as("__target"),
        col(valCol).as("normalized"))
    withRanks.join(lookup, "__target")
      .drop("__target", "__grank")
  }

  /** Multinomial NAIVE BAYES with Laplace smoothing, every
    * log-probability a deterministic integer milli-nat
    * (floor(1000·ln x), the q88/q289 convention — one libm call per
    * COUNT, reaching the argmax only through the floor, so training
    * and scoring are engine-restatable bit for bit):
    *
    *   score(d, c) = prior_c + Σ_{t ∈ d} [ m(cnt_{c,t} + 1)
    *                                        − m(ctot_c + V) ]
    *   prior_c    = m(docs_c) − m(docs_total),   m(x) = ⌊1000·ln x⌋
    *
    * The classical text classifier at its distributed shape: training
    * is two hash aggregations (class×token counts, class totals);
    * the likelihood grid is (classes × vocab) — MODEL-sized, broadcast
    * to score; scoring fans each test token out × classes (classes
    * bounded) and argmaxes per doc with a deterministic (−score,
    * class) tie-break. Returns the CONFUSION MATRIX over the held-out
    * split — the end-to-end train/score/eval loop in one plan.
    *
    * Split: md5-60(id+seed) % 5 == 0 → test (the [[Sampling]] hash
    * convention). Tokens are the \s+ convention.
    *
    * @return (actual, predicted, n) */
  def naiveBayesConfusionMilli(df: DataFrame, idCol: String,
      textCol: String, labelCol: String, seed: String): DataFrame = {
    def m(c: org.apache.spark.sql.Column) =
      floor(lit(1000.0) * log(c.cast("double"))).cast("long")
    val split = pmod(Dedup.md5Hash60(
      concat(col(idCol).cast("string"), lit(seed))), lit(5L))
    // materialized (r14): the exploded token frame feeds SIX
    // consumers (class counts, vocab + its count, the train-doc
    // count, the class-term counts, and the test side) — each re-ran
    // the tokenize+explode subtree unmaterialized. Same for vocab
    // (its count + the likelihood-grid cross join).
    val toks = Materialize(df
      .select(col(idCol), col(labelCol).as("__lbl"), split.as("__s"),
        explode(split_part_tokens(col(textCol))).as("__t")))
    val train = toks.filter(col("__s") =!= 0L)
    val test = toks.filter(col("__s") === 0L)
    val classCounts = train.groupBy(col("__lbl").as("__c"))
      .agg(count(lit(1)).as("__ctot"),
        count_distinct(col(idCol)).as("__cdocs"))
    val vocab = Materialize(train.select(col("__t")).distinct())
    val vSize = vocab.count()
    val totDocs = train.select(col(idCol)).distinct().count()
    val ctCounts = train.groupBy(col("__lbl").as("__c"), col("__t"))
      .agg(count(lit(1)).as("__n"))
    // model-sized likelihood grid: classes × vocab, zero counts kept
    val grid = classCounts.crossJoin(vocab)
      .join(ctCounts, Seq("__c", "__t"), "left")
      .na.fill(0L, Seq("__n"))
      .select(col("__c"), col("__t"),
        (m(col("__n") + 1) - m(col("__ctot") + lit(vSize)))
          .as("__l"))
    val priors = classCounts.select(col("__c"),
      (m(col("__cdocs")) - m(lit(totDocs))).as("__prior"),
      (-m(col("__ctot") + lit(vSize))).as("__oov"))
    val scored = test
      .crossJoin(broadcast(priors.select(col("__c"), col("__oov"))))
      .join(broadcast(grid), Seq("__c", "__t"), "left")
      .select(col(idCol), col("__lbl"), col("__c"),
        coalesce(col("__l"), col("__oov")).as("__l"))
      .groupBy(col(idCol), col("__lbl"), col("__c"))
      .agg(sum(col("__l")).as("__ls"))
      .join(broadcast(priors.select(col("__c"), col("__prior"))),
        "__c")
      .withColumn("__score", col("__ls") + col("__prior"))
    scored.groupBy(col(idCol), col("__lbl"))
      .agg(min(struct((-col("__score")).as("__neg"),
        col("__c"))).as("__best"))
      .groupBy(col("__lbl").as("actual"),
        col("__best.__c").as("predicted"))
      .agg(count(lit(1)).as("n"))
  }

  /** SIMPSON'S-PARADOX REVERSAL AUDIT — the classic confounding check
    * before trusting an aggregate A/B rate comparison (Simpson 1951;
    * Bickel et al. 1975's Berkeley admissions is the canonical case):
    * per stratum, which side has the higher success rate, and does the
    * POOLED comparison point the same way? A reversal (every stratum
    * agrees on one direction, the pooled rates on the other) means the
    * stratum mix, not the treatment, drives the aggregate.
    *
    * Exactness: rate comparisons are integer CROSS-MULTIPLICATIONS —
    * sign(s_a·n_b − s_b·n_a) — never rate divisions, so every
    * direction is a BIGINT sign any engine replays. Output: one row
    * per stratum (counts, successes, cross-mult diff, direction) plus
    * one `__pooled__` row; `reversed` is set on the pooled row when
    * all nonzero stratum directions agree and the pooled direction is
    * their opposite. One hash aggregation + one bounded-axis rollup.
    *
    * Overflow: s·n products cap at (rows per side)² — exact in BIGINT
    * to ~3e9 rows per side per stratum; DECIMAL(38,0) past that.
    *
    * @param sideCol boolean-ish: false/0 = A, true/1 = B
    * @return (stratum, n_a, s_a, n_b, s_b, cross_diff, direction,
    *         reversed) — stratum '__pooled__' carries the verdict */
  def simpsonsReversal(df: DataFrame, stratumCol: String,
      sideCol: String, successCol: String): DataFrame = {
    val b = col(sideCol).cast("boolean")
    val y = col(successCol).cast("boolean").cast("long")
    val per = df.groupBy(col(stratumCol).cast("string").as("stratum"))
      .agg(count(when(!b, 1)).as("n_a"),
        coalesce(sum(when(!b, y)), lit(0L)).as("s_a"),
        count(when(b, 1)).as("n_b"),
        coalesce(sum(when(b, y)), lit(0L)).as("s_b"))
      .withColumn("cross_diff",
        col("s_a") * col("n_b") - col("s_b") * col("n_a"))
      .withColumn("direction", signum(col("cross_diff")).cast("long"))
    val pooled = per.agg(sum(col("n_a")).as("n_a"),
        sum(col("s_a")).as("s_a"), sum(col("n_b")).as("n_b"),
        sum(col("s_b")).as("s_b"),
        // stratum consensus: min/max over the nonzero directions
        min(when(col("direction") =!= 0L, col("direction")))
          .as("__dmin"),
        max(when(col("direction") =!= 0L, col("direction")))
          .as("__dmax"))
      .withColumn("stratum", lit("__pooled__"))
      .withColumn("cross_diff",
        col("s_a") * col("n_b") - col("s_b") * col("n_a"))
      .withColumn("direction", signum(col("cross_diff")).cast("long"))
      .withColumn("reversed",
        col("__dmin").isNotNull && col("__dmin") === col("__dmax")
          && col("direction") =!= 0L
          && col("direction") === -col("__dmin"))
      .select(col("stratum"), col("n_a"), col("s_a"), col("n_b"),
        col("s_b"), col("cross_diff"), col("direction"), col("reversed"))
    per.withColumn("reversed", lit(false))
      .select("stratum", "n_a", "s_a", "n_b", "s_b", "cross_diff",
        "direction", "reversed")
      .unionByName(pooled)
  }

  /** TOKEN-DISTRIBUTION JENSEN–SHANNON DIVERGENCE between two corpus
    * slices — the drift detector for text (is this crawl snapshot /
    * source mix distributed like the last one?), complementing
    * [[histogramDrift]]'s per-bucket TV gaps with the single
    * information-theoretic number (Lin 1991). JSD = ½Σpₓln(pₓ/mₓ) +
    * ½Σqₓln(qₓ/mₓ), m = (p+q)/2 — symmetric, bounded by ln 2, zero
    * iff identical.
    *
    * Exactness discipline (the q289 entropy-gate convention): each
    * token's log ratio is 2·aₓ·B / (aₓ·B + bₓ·A), with the products
    * computed in DOUBLE in a fixed written order (IEEE 754 — both
    * engines round each product identically, and below 2⁵³ per
    * product the doubles ARE the exact integers), floored to integer
    * micro-nats; the per-token terms then weight by the exact counts
    * and SUM as BIGINTs — order-free, so the total is bit-identical
    * at any parallelism and restatable by any engine sharing the
    * per-term formula text. The products stay in double deliberately:
    * a BIGINT aₓ·B overflows int64 (ANSI raise) once per-side totals
    * reach ~3e9 tokens, four orders of magnitude below the Σ-side
    * bound. Zero-count cells contribute exactly 0 (their weight is
    * the count itself).
    *
    * Scale shape: two token-count hash aggregations + one full-outer
    * join on token + one sum — no windows, no collects; vocabulary-
    * sized intermediates.
    *
    * Overflow: |term_micro| ≤ 693147 (ln 2), so Σ a·term needs
    * A · 693147 < 2⁶³ — exact to ~1.3e13 total tokens per side; lift
    * to DECIMAL(38,0) past that (the welchTTest convention).
    *
    * @return one row: n_tok_a, n_tok_b, vocab, sum_a_term (Σ aₓ·tₐ),
    *         sum_b_term (Σ bₓ·t_b) — exact BIGINT micro-nat·count —
    *         and jsd_micro = sum_a/(2A) + sum_b/(2B) as the one final
    *         double formula */
  def tokenJsdMicro(a: DataFrame, b: DataFrame,
      textCol: String): DataFrame = {
    def counts(df: DataFrame, n: String): DataFrame = df
      .select(explode(split_part_tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as(n))
    val ca = counts(a, "n_a")
    val cb = counts(b, "n_b")
    val joined = ca.join(cb, Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tot = joined.agg(sum(col("n_a")).as("ta"),
      sum(col("n_b")).as("tb"), count(lit(1)).as("vocab"))
    joined.crossJoin(broadcast(tot))
      // term_a = floor(1e6·ln(2·a·B/(a·B + b·A))) for a > 0, else 0 —
      // formula text shared verbatim with the DuckDB oracle
      .select(col("ta"), col("tb"), col("vocab"),
        expr("""CASE WHEN n_a = 0 THEN CAST(0 AS BIGINT)
               |  ELSE n_a * CAST(floor(1000000 * ln(
               |    2 * CAST(n_a AS DOUBLE) * tb
               |      / (CAST(n_a AS DOUBLE) * tb
               |         + CAST(n_b AS DOUBLE) * ta))) AS BIGINT)
               |END""".stripMargin).as("__wa"),
        expr("""CASE WHEN n_b = 0 THEN CAST(0 AS BIGINT)
               |  ELSE n_b * CAST(floor(1000000 * ln(
               |    2 * CAST(n_b AS DOUBLE) * ta
               |      / (CAST(n_a AS DOUBLE) * tb
               |         + CAST(n_b AS DOUBLE) * ta))) AS BIGINT)
               |END""".stripMargin).as("__wb"))
      .groupBy(col("ta").as("n_tok_a"), col("tb").as("n_tok_b"),
        col("vocab"))
      .agg(sum(col("__wa")).as("sum_a_term"),
        sum(col("__wb")).as("sum_b_term"))
      .withColumn("jsd_micro", expr(
        "CAST(sum_a_term AS DOUBLE) / (2 * n_tok_a)" +
          " + CAST(sum_b_term AS DOUBLE) / (2 * n_tok_b)"))
  }

  /** CALIBRATION RELIABILITY BINS + Brier decomposition inputs — the
    * model-eval companion to q310's precision/recall: does a predicted
    * probability MEAN what it says? (Murphy 1973's reliability diagram;
    * Guo et al. 2017's ECE popularized the binned form for neural
    * classifiers.) Scores arrive as INTEGER MICROS in [0, 1e6] (the
    * house fixed-point discipline — the caller converts once, exactly),
    * labels as 0/1.
    *
    * Per equal-width bin (floor(score·bins/1e6), top edge clamped into
    * the last bin): n, Σ score_micro, n_pos — all exact BIGINT — plus
    * `ece_gap_num` = |Σ score_micro − n_pos·1e6| (the bin's
    * |mean-pred − frac-pos|·n·1e6, kept as one exact integer so
    * ECE = Σ gaps / (N·1e6) is a single final division) and
    * `brier_num` = Σ (score_micro − label·1e6)² (Brier score =
    * brier_num / (N·1e12)). The derived doubles (mean_pred, frac_pos)
    * are one division each over the exact sums.
    *
    * Scale shape: ONE hash aggregation by bin id — map-side
    * combinable, bins-sized output. Overflow: brier_num adds ≤ 1e12
    * per row — exact in BIGINT to ~9.2M rows PER BIN; past that lift
    * to DECIMAL(38,0) (the [[SeriesStats.welchTTest]] convention).
    *
    * @return one row per non-empty bin: bin, n, sum_score_micro,
    *         n_pos, mean_pred, frac_pos, ece_gap_num, brier_num */
  def calibrationBins(df: DataFrame, scoreMicroCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val s = col(scoreMicroCol).cast("long")
    val y = col(labelCol).cast("long")
    df.select(
        least(expr(s"(CAST($scoreMicroCol AS BIGINT) * $bins)" +
          " div 1000000"), lit(bins - 1L)).as("bin"),
        s.as("__s"), y.as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__s")).as("sum_score_micro"),
        sum(col("__y")).as("n_pos"),
        sum((col("__s") - col("__y") * lit(1000000L))
          * (col("__s") - col("__y") * lit(1000000L))).as("brier_num"))
      .withColumn("mean_pred",
        expr("CAST(sum_score_micro AS DOUBLE) / n / 1000000.0"))
      .withColumn("frac_pos", expr("CAST(n_pos AS DOUBLE) / n"))
      .withColumn("ece_gap_num",
        abs(col("sum_score_micro") - col("n_pos") * lit(1000000L)))
      .select("bin", "n", "sum_score_micro", "n_pos", "mean_pred",
        "frac_pos", "ece_gap_num", "brier_num")
  }

  /** The \s+ token split every text op here shares. */
  private def split_part_tokens(c: org.apache.spark.sql.Column) =
    split(trim(c), "\\s+")
}
