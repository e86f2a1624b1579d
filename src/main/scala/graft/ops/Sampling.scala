package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `sample()`/`randomSplit()` are partition-order-dependent: a document
  * can migrate between train and test when the cluster size, file
  * layout, or Spark version changes — silent eval contamination. The
  * hash split assigns by content key: bucket = top-60-md5-bits(key ‖
  * seed) mod `buckets`, then cumulative per-mille thresholds. Stable
  * across runs, engines, and cluster sizes, and exactly restatable in
  * any engine with md5 (same construction as
  * [[Dedup.md5Hash60]] — see q51's DuckDB twin).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the key and a salt — ONE
    * shared 60-bit construction ([[Dedup.md5Hash60]]) so the q23/q51
    * oracle twins can never drift apart. */
  def hashBucket(key: Column, seed: String, buckets: Int = 10000): Column =
    pmod(Dedup.md5Hash60(concat(key.cast("string"), lit(seed))),
      lit(buckets.toLong))

  /** Assign every row a named split by hash-bucket thresholds.
    *
    * @param fractions (name, weight) in priority order; weights should
    *                  sum to 1 (the last split absorbs rounding).
    */
  def hashSplit(df: DataFrame, keyCol: String, seed: String,
      fractions: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      buckets: Int = 10000): DataFrame = {
    require(fractions.nonEmpty)
    val b = hashBucket(col(keyCol), seed, buckets)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    var assign: Column = lit(fractions.last._1)
    for (((name, _), c) <- fractions.zip(cum).init.reverse)
      assign = when(b < math.round(c * buckets), lit(name)).otherwise(assign)
    df.withColumn("bucket", b).withColumn("split", assign)
  }

  /** Bounded top-k buffer for [[topKPerGroupAgg]]: a sorted ≤ k-entry
    * list by (score desc, key asc), mergeable — Spark's partial
    * aggregation runs it map-side, so the shuffle carries O(k) per
    * (partition, group), never the group's full row set. The ranking
    * sibling of [[HeavyHitters.MisraGries]]. Rows below the current
    * k-th are rejected O(1). */
  final class TopKBuffer(k: Int) extends org.apache.spark.sql.expressions
      .Aggregator[(Long, Double), List[(Double, Long)], Seq[(Double, Long)]] {
    require(k >= 1, s"k must be >= 1, got $k")
    // ordering: score desc, key asc — (s, key) "beats" (s2, key2) iff
    private def beats(s: Double, key: Long, s2: Double, key2: Long) =
      s > s2 || (s == s2 && key < key2)
    override def zero: List[(Double, Long)] = Nil
    override def reduce(b: List[(Double, Long)],
        in: (Long, Double)): List[(Double, Long)] = {
      val (key, s) = in
      if (b.lengthCompare(k) >= 0 && {
        val (ls, lk) = b.last; !beats(s, key, ls, lk)
      }) b
      else {
        val (before, after) = b.span { case (bs, bk) => beats(bs, bk, s, key) }
        (before ::: (s, key) :: after).take(k)
      }
    }
    override def merge(b1: List[(Double, Long)],
        b2: List[(Double, Long)]): List[(Double, Long)] =
      (b1 ::: b2).sortWith { case ((s, key), (s2, key2)) =>
        beats(s, key, s2, key2)
      }.take(k)
    override def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.Encoders.kryo[List[(Double, Long)]]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.Encoders.kryo[Seq[(Double, Long)]]
  }

  /** Exact per-group top-k by score WITHOUT a window sort: where
    * [[topFractionPerGroup]]/[[capPerGroup]] rank EVERY group row
    * through a hash-partitioned window (right when you keep a
    * fraction), a fixed small k only ever needs a bounded buffer — the
    * typed [[TopKBuffer]] partial-aggregates map-side, so a hot group
    * (one domain = half the corpus) costs O(k) shuffle instead of a
    * full per-group sort. Deterministic: ties break by key asc, so any
    * engine restates the exact winner set (q105).
    *
    * Null scores cannot rank and null groups cannot key a group —
    * both are rejected loudly rather than silently dropped.
    *
    * @return (groupCol, keyCol, score, group_rank 1..k) */
  def topKPerGroupAgg(df: DataFrame, groupCol: String, keyCol: String,
      scoreCol: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000,
      s"k must be in [1, 1000] (bounded-buffer regime; use " +
        s"topFractionPerGroup for keep-a-fraction), got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(col(groupCol).cast("string").as("__g"),
      col(keyCol).cast("long").as("__k"), scoreCol.cast("double").as("__s"))
    val agg = new TopKBuffer(k)
    prepared
      .map { r =>
        require(!r.isNullAt(0), s"null $groupCol cannot key a group")
        require(!r.isNullAt(2), s"null score for $keyCol=${r.getLong(1)}")
        require(!r.getDouble(2).isNaN,
          s"NaN score for $keyCol=${r.getLong(1)} cannot rank")
        (r.getString(0), r.getLong(1), r.getDouble(2))
      }
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.toColumn)
      .flatMap { case (g, tops) =>
        tops.iterator.zipWithIndex.map { case ((s, key), i) =>
          (g, key, s, (i + 1).toLong)
        }
      }
      .toDF(groupCol, keyCol, "score", "group_rank")
  }

  /** LEAKAGE-FREE train/val/test split: near-duplicate documents must
    * never straddle a split boundary (a test doc whose near-dup sits in
    * train inflates every eval number — the classic contamination-by-
    * split bug), so the split KEY is the document's duplicate-cluster
    * representative rather than the document itself: every member of a
    * cluster hashes identically and lands in the same split. Singleton
    * docs key by their own id. `pairs` comes from any near-dup pair
    * generator (LSH n-gram, winnowing, semantic — q22/q65/q80 shapes).
    *
    * Shape: composes two proven pieces — [[Dedup.duplicateClusters]]
    * (q49) and [[hashSplit]]'s pure-map assignment (q51) — plus one
    * left join of docs onto the cluster map, which is duplicate-count
    * sized (≪ corpus; AQE broadcasts it when small). q101's oracle
    * restates the closure, the representative choice, and the split
    * math end to end.
    *
    * @return input + (split_key, bucket, split) */
  def leakageFreeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      seed: String,
      fractions: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      buckets: Int = 10000): DataFrame = {
    val clusters = Dedup.duplicateClusters(pairs)
      .select(col("id").as(idCol), col("cluster_id"))
    val keyed = df.join(clusters, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col(idCol)))
      .drop("cluster_id")
    hashSplit(keyed, "split_key", seed, fractions, buckets)
  }

  /** Keep the TOP `fracPermille`‰ of each group's rows by score — the
    * per-source quality-quantile filter ("best 25% by quality per
    * domain") every curation recipe runs after scoring: a global
    * threshold would let one high-scoring source crowd out the rest,
    * so the cut is per group. Thresholds are PURE-INTEGER per-mille
    * (`rank · 1000 ≤ ‰ · n`, the [[stratifiedSplit]] rule) so any
    * engine restates the exact surviving set (q95); ties break by key.
    * A group smaller than 1000/‰ rows keeps zero rows — floor, not
    * ceil, so the kept fraction never exceeds the asked one.
    *
    * Shape: one hash-partitioned window per group (rank and count
    * share the partition — the [[capPerGroup]] price). The score column
    * must be deterministic for the oracle to restate it.
    *
    * @return surviving rows + (group_rank 1-based, group_n) */
  def topFractionPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      scoreCol: Column, fracPermille: Long): DataFrame = {
    require(fracPermille >= 1 && fracPermille <= 1000,
      s"fracPermille must be in [1, 1000], got $fracPermille")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("__score").desc, col(keyCol).asc)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    df.withColumn("__score", scoreCol)
      .withColumn("group_rank", row_number().over(w).cast("long"))
      .withColumn("group_n", count(lit(1)).over(wAll))
      .filter(col("group_rank") * 1000 <= col("group_n") * fracPermille)
      .drop("__score")
  }

  /** Deterministic EXACT-SIZE uniform sample: exactly `min(n, |df|)`
    * rows, chosen by seeded hash rank with the key as tie-break — the
    * fixed-budget eval-set / human-review draw [[hashSplit]]'s per-row
    * thresholding can't promise (a 10 000-row eval target lands
    * binomially ±1%, this lands exact). Same determinism contract as
    * the other samplers: selection depends only on (key, seed), so any
    * engine re-derives the identical row set (q90's DuckDB twin).
    *
    * Shape: [[Packing.globalRowNumber]]'s two-pass distributed rank
    * over (hash, key) with `n` as its limit — tail partitions past the
    * quota are skipped wholesale, no unpartitioned window, no
    * driver-side data. The tradeoff vs hashSplit is the same as
    * [[stratifiedSplit]]'s: the quota depends on the GLOBAL rank, so
    * adding rows can rotate others out of the sample; use hashSplit
    * when membership must never migrate, sampleExact when the size
    * must hold exactly.
    *
    * @return the sampled rows with `sample_rank` (0-based, dense) */
  def sampleExact(df: DataFrame, keyCol: String, n: Long,
      seed: String): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(!df.columns.contains("__r"),
      "input must not already carry a __r column")
    Packing.globalRowNumber(
      df.withColumn("__r",
        Dedup.md5Hash60(concat(col(keyCol).cast("string"), lit(seed)))),
      Seq(col("__r").asc, col(keyCol).asc), "sample_rank", limit = n)
      .drop("__r")
  }

  /** WEIGHTED sample without replacement, exact size n — Efraimidis &
    * Spirakis 2006 ("Weighted random sampling with a reservoir"): each
    * row draws u ~ U(0,1] and the n rows with the largest u^(1/w) win,
    * which makes every selection step pick proportionally to weight
    * (the quality-weighted eval-draw / seed-corpus sampler: w = token
    * count, quality score, citation count).
    *
    * Deterministic and engine-restatable: u = (md5-60(key ‖ seed) + 1)
    * / 2^60 — the repo's shared construction, and the division is by a
    * power of two, so u is bit-exact in any IEEE engine. Rows rank by
    * the equivalent key d = −ln(u)/w ascending (monotone transform of
    * u^(1/w) descending), FLOORED to integer micro-units: ln() is the
    * one libm call in the gate path and engines may differ in its last
    * ulp (the q120 pow() concern), so ranking runs on
    * floor(d·10⁶) — a 1-ulp ln drift flips a row's integer key only
    * when d sits within ~2 ulp of a micro-unit boundary (P ≈ 10⁻⁸/row)
    * — with the content key as tie-break for rows the flooring ties.
    *
    * Scale shape: the key is a pure map over the scan; the rank is
    * [[Packing.globalRowNumber]]'s two-pass distributed scan with n as
    * its limit (never an unpartitioned window); output is n rows.
    *
    * Weights must be positive: a null, zero, or negative weight has no
    * sampling probability and fails loudly (the q83/q79 null-hygiene
    * convention — silent drops hide a broken upstream score).
    *
    * @return the sampled rows + `sample_rank` (0-based, by d asc) */
  def weightedSampleExact(df: DataFrame, keyCol: String, weightCol: Column,
      n: Long, seed: String): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(!df.columns.contains("__dk"),
      "input must not already carry a __dk column")
    val u = (Dedup.md5Hash60(concat(col(keyCol).cast("string"), lit(seed)))
      + lit(1L)).cast("double") / lit(1152921504606846976.0) // 2^60
    val w = weightCol.cast("double")
    val dk = floor(-log(u) / w * lit(1e6)).cast("long")
    val guarded = when(w > 0.0, dk).otherwise(raise_error(concat(
      lit("weightedSampleExact: non-positive or null weight for key "),
      col(keyCol).cast("string"))))
    Packing.globalRowNumber(
      df.withColumn("__dk", guarded),
      Seq(col("__dk").asc, col(keyCol).asc), "sample_rank", limit = n)
      .drop("__dk")
  }

  /** Deterministic per-group quota: keep at most `cap` rows per group,
    * chosen by hash rank — the per-domain/per-source cap every web
    * corpus applies so a handful of template-heavy domains can't
    * dominate training (C4, Dolma, and FineWeb all cap per host).
    *
    * Selection ranks rows inside each group by md5-60(key ‖ seed) with
    * the key itself as tie-break, so (a) which rows survive depends only
    * on content keys — re-runs, cluster resizes, and other engines pick
    * the SAME rows (q68's DuckDB twin), and (b) the picks are an
    * unbiased pseudo-random sample of the group, not "first N by
    * ingestion order" (ingestion order correlates with crawl frontier
    * policy — a real bias).
    *
    * Shape: one hash-partitioned window per group. Group cardinality is
    * domain count (millions), so partitions stay balanced; a single
    * mega-group (one domain = half the corpus) is exactly the case the
    * cap exists for, and rank-then-filter still only materializes
    * `cap` winners per group after the shuffle.
    */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      cap: Int, seed: String): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("__r").asc, col(keyCol).asc)
    df.withColumn("__r",
        Dedup.md5Hash60(concat(col(keyCol).cast("string"), lit(seed))))
      .withColumn("group_rank", row_number().over(w))
      .filter(col("group_rank") <= cap)
      .drop("__r")
  }

  /** Deterministic token-budget corpus MIXING: downsample every source
    * so its share of a total token budget matches its mixture weight —
    * the "data recipe" step every pretraining corpus build runs (e.g.
    * N parts web, 1 part code, 2 parts books) after curation and before
    * packing.
    *
    * All integer arithmetic so any engine restates the exact row set:
    * per-source target = (budgetTokens · weight‰) div 1000; keep rate =
    * min(1000, target·1000 div sourceTokens) per-mille; a row survives
    * iff md5-60-bucket(key ‖ seed) mod 1000 < rate. Sources above their
    * target thin uniformly-at-random-by-hash (unbiased, stable across
    * engines/cluster sizes — same construction as [[hashSplit]]);
    * sources already under target keep everything (rate caps at 1000 —
    * this operator only downsamples; upsampling is a repetition-factor
    * decision for the training loader, not a row filter).
    *
    * Scale shape: one map-side-combined agg for source totals (sources
    * = domains, bounded), one join of rates back onto rows — unhinted,
    * AQE broadcasts the rate table when small — and a pure-map hash
    * filter. No windows, no driver collect. A NULL source is a source:
    * the rate join is null-safe (`<=>`), so unlabeled rows form their
    * own stratum at defaultPermille instead of vanishing through an
    * equi-join.
    *
    * @param weightsPermille explicit per-source mixture weights (‰);
    *                        sources not listed get defaultPermille
    * @return surviving rows with n_tokens and rate_permille appended
    */
  def mixToBudget(df: DataFrame, sourceCol: String, keyCol: String,
      tokenCol: Column, budgetTokens: Long,
      weightsPermille: Map[String, Long], defaultPermille: Long,
      seed: String): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(defaultPermille >= 0 && weightsPermille.values.forall(_ >= 0),
      "mixture weights must be non-negative")
    require(!df.columns.contains("__mix_src"),
      "input must not already carry a __mix_src column")
    val withTok = df.withColumn("n_tokens", tokenCol)
    val wpm = weightsPermille.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPermille)) { case (acc, (s, w)) =>
        when(col(sourceCol) === s, lit(w)).otherwise(acc)
      }
    val rates = withTok.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens")).cast("long").as("__t"))
      .withColumn("__wpm", wpm)
      .withColumn("rate_permille",
        least(lit(1000L),
          when(col("__t") > 0,
            expr(s"((${budgetTokens}L * __wpm) div 1000 * 1000) div __t"))
            .otherwise(lit(1000L))))
      .select(col(sourceCol).as("__mix_src"), col("rate_permille"))
    // null-safe join: a null source grouped into its own rate row above
    // must find it here too (plain equi-join drops null keys silently)
    withTok.join(rates, col(sourceCol) <=> col("__mix_src"))
      .drop("__mix_src")
      .filter(hashBucket(col(keyCol), seed, 1000) < col("rate_permille"))
  }

  /** SQUARE-ROOT temperature mixture sampling (T = 2) — the standard
    * multilingual/multi-source rebalancing: target share ∝ √(corpus
    * share), which flattens the mixture toward small sources without
    * letting any single source dominate. Downsample-only (the
    * [[mixToBudget]] convention): the smallest source keeps everything
    * (rate 1000‰) and source s thins to √(t_min/t_s), which realizes
    * the √-proportional target mix exactly up to per-mille rounding.
    *
    * T is PINNED at 2 deliberately: the rate formula is then
    * floor(1000·sqrt(t_min/t_s)) — division, sqrt, multiply are all
    * correctly-rounded IEEE ops over exact integer totals, so any
    * engine restates the rates bitwise (q120). A free temperature
    * needs pow(), whose last ulp is libm-specific and would break the
    * hash gate; generalize by chaining sqrt (T = 4 = √√) if needed.
    *
    * Scale shape: one map-side-combined totals agg (sources bounded),
    * a 1-row min broadcast, the rate join back (null-safe — a NULL
    * source is its own stratum), and a pure-map hash filter. No
    * windows, no driver collect.
    *
    * @return surviving rows + n_tokens + rate_permille
    */
  def temperatureMixSqrt(df: DataFrame, sourceCol: String, keyCol: String,
      tokenCol: Column, seed: String): DataFrame = {
    require(!df.columns.contains("__mix_src"),
      "input must not already carry a __mix_src column")
    val withTok = df.withColumn("n_tokens", tokenCol)
    val totals = withTok.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens")).cast("long").as("__t"))
    // min over POSITIVE totals only: a zero-token source must not zero
    // every rate; sources without positive totals keep everything
    val tmin = totals.filter(col("__t") > 0)
      .agg(min(col("__t")).as("__tmin"))
    val rates = totals.crossJoin(broadcast(tmin))
      .withColumn("rate_permille",
        when(col("__t") > 0 && col("__tmin").isNotNull,
          least(lit(1000L),
            floor(sqrt(col("__tmin").cast("double") / col("__t")) *
              lit(1000.0)).cast("long")))
          .otherwise(lit(1000L)))
      .select(col(sourceCol).as("__mix_src"), col("rate_permille"))
    withTok.join(rates, col(sourceCol) <=> col("__mix_src"))
      .drop("__mix_src")
      .filter(hashBucket(col(keyCol), seed, 1000) < col("rate_permille"))
  }

  /** Size-balanced shard assignment — equal-weight output shards for
    * training-data export (the [[graft.io]] JSONL shard writer's
    * partner): rows rank globally by (weight desc, id asc) and shard
    * round-robin by rank — the deterministic longest-processing-time
    * approximation (each of the k heaviest rows opens a shard; from
    * there strides interleave), which lands shard totals within one
    * max-row weight of each other for realistic distributions.
    *
    * Shape: ONE [[Packing.globalRowNumber]] two-pass scan; the shard
    * id is pure integer math on the rank. No windows, no collect.
    *
    * @return (idCol, weightCol, shard int)
    */
  def balancedShards(df: DataFrame, idCol: String, weightCol: String,
      numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val base = df.select(col(idCol),
      col(weightCol).cast("long").as(weightCol))
    Packing.globalRowNumber(base,
        Seq(col(weightCol).desc, col(idCol).asc), "__rank")
      .withColumn("shard", pmod(col("__rank"), lit(numShards.toLong))
        .cast("int"))
      .drop("__rank")
  }

  /** EXACT-QUOTA stratified split: within every stratum (language,
    * domain, quality band) rows are ranked by seeded hash and assigned
    * splits by rank thresholds — each stratum lands within one row of
    * its target fractions, where [[hashSplit]]'s per-row thresholding
    * is only binomially close (a 200-doc language can miss its 10%
    * eval share by several points; at eval-set sizes that is real
    * noise). The tradeoff is stability: quotas depend on stratum
    * COUNTS, so adding a row can reassign others within its stratum —
    * use hashSplit when rows must never migrate, stratifiedSplit when
    * per-stratum proportions must hold exactly. Both are seeded-hash
    * deterministic: any engine recomputes the same assignment (q74).
    *
    * Shape: one window (rank + count share a partition) on the stratum
    * key — the same single-shuffle price as [[capPerGroup]].
    */
  def stratifiedSplit(df: DataFrame, strataCol: String, keyCol: String,
      seed: String,
      fractions: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    require(fractions.nonEmpty)
    // the thresholds quantize to per-mille: a fraction finer than the
    // 1/1000 resolution collapses two cumulative thresholds into one and
    // silently starves a split, and a sum > 1 makes later splits
    // unreachable — fail loudly instead
    fractions.foreach { case (name, f) =>
      require(f > 0.0, s"fraction for '$name' must be > 0, got $f")
    }
    require(fractions.map(_._2).sum <= 1.0 + 1e-9,
      s"fractions sum to ${fractions.map(_._2).sum} > 1")
    val cumPermille = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * 1000))
    (0L +: cumPermille).zip(cumPermille).zip(fractions).foreach {
      case ((prev, cur), (name, f)) => require(cur > prev,
        s"fraction for '$name' ($f) is below the 1/1000 resolution of " +
          "the integer thresholds (its cumulative threshold collapses " +
          "into the previous split's); use coarser fractions")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("__r").asc, col(keyCol).asc)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
    // PURE-INTEGER per-mille thresholds (rank·1000 ≤ ‰·n): a double
    // form like rank <= round(cum*n) drifts cross-engine because the
    // cumulated fraction (0.8+0.1) and the literal 0.9 are different
    // doubles — integer math restates exactly everywhere
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * 1000))
    var assign: Column = lit(fractions.last._1)
    for (((name, _), permille) <- fractions.zip(cum).init.reverse)
      assign = when(col("__rank") * 1000L <= lit(permille) * col("__n"),
        lit(name)).otherwise(assign)
    df.withColumn("__r",
        Dedup.md5Hash60(concat(col(keyCol).cast("string"), lit(seed))))
      .withColumn("__rank", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("split", assign)
      .drop("__r", "__rank", "__n")
  }

  /** Deterministic WEIGHTED INTERLEAVE schedule — the data-loader
    * consumption ORDER for a source mixture, where [[temperatureMixSqrt]]
    * and [[mixToBudget]] decide how much of each source to take: every
    * kept row gets a dense global `position` such that any prefix of
    * the schedule contains sources in proportion to their weights
    * (while they last), with rows inside a source in seeded-shuffle
    * order. The standard interleave: a source's r-th row (1-based)
    * schedules at key r/w — realized as the ppb-quantized integer
    * `(r * 1e9) div w` so the whole order is integer math, bit-stable
    * at any parallelism and restatable by any engine (q140's twin).
    * Zero-weight sources drop from the schedule entirely.
    *
    * Scale shape: TWO [[Packing.globalRowNumber]] two-pass scans (one
    * for per-source shuffle ranks — recovered from a single global
    * rank by subtracting each source's broadcast min, the
    * lengthBucketedBatches trick, so no per-source window ever
    * exists — one for the final position), plus one |sources|-row
    * broadcast join. No unpartitioned windows, no collect beyond the
    * per-source minima.
    *
    * @param weightsPermille per-source weights (any positive scale;
    *        ratios are what matter); missing sources use
    *        `defaultPermille`
    * @return (idCol, sourceCol, position long dense from 0)
    */
  /** MULTI-EPOCH token-budget allocation — the data-constrained
    * scaling plan (Muennighoff et al. 2023, "Scaling Data-Constrained
    * Language Models": repeating data is worth it up to ~4 epochs):
    * given a token budget and per-source target shares, each source is
    * assigned FULL passes over its corpus (capped at `maxEpochs`) plus
    * a per-mille partial pass covering the remainder — the planner
    * whose realized selection is [[mixToBudget]]'s hash filter run per
    * epoch. All arithmetic is integer (`div`, per-mille), so the plan
    * is engine-restatable (q161) and independent of cluster size.
    *
    * Scale shape: ONE map-side-combined per-source token sum (sources
    * bounded) and pure per-row integer math on the source-sized
    * result. Output is model-sized: one row per source.
    *
    * @param weightsPermille target mixture share per source (‰ of the
    *        budget); sources absent from the map use `defaultPermille`
    * @return (sourceCol, n_tokens_total, target_tokens, epochs_full,
    *         partial_permille, planned_tokens) where planned_tokens =
    *         epochs_full·T + (partial_permille·T) div 1000 — the token
    *         mass the per-mille-granular selection actually realizes
    */
  def epochAllocation(df: DataFrame, sourceCol: String, tokenCol: Column,
      budgetTokens: Long, weightsPermille: Map[String, Long],
      defaultPermille: Long, maxEpochs: Int): DataFrame = {
    require(budgetTokens > 0,
      s"budgetTokens must be positive, got $budgetTokens")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    require(defaultPermille >= 0 && weightsPermille.values.forall(_ >= 0),
      "mixture weights must be non-negative")
    val wpm = weightsPermille.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPermille)) { case (acc, (s, w)) =>
        when(col(sourceCol) === s, lit(w)).otherwise(acc)
      }
    df.groupBy(col(sourceCol))
      .agg(sum(tokenCol.cast("long")).as("n_tokens_total"))
      .withColumn("__wpm", wpm)
      .withColumn("target_tokens",
        expr(s"(${budgetTokens}L * __wpm) div 1000"))
      .withColumn("epochs_full",
        least(lit(maxEpochs.toLong),
          when(col("n_tokens_total") > 0,
            expr("target_tokens div n_tokens_total")).otherwise(lit(0L))))
      // a source at the epoch cap takes no partial pass (the cap bounds
      // TOTAL passes); below the cap the remainder thins per-mille
      .withColumn("partial_permille",
        when(col("n_tokens_total") > 0 && col("epochs_full") < maxEpochs,
          expr("((target_tokens - epochs_full * n_tokens_total) * 1000)" +
            " div n_tokens_total"))
          .otherwise(lit(0L)))
      .withColumn("planned_tokens",
        expr("epochs_full * n_tokens_total + " +
          "(partial_permille * n_tokens_total) div 1000"))
      .select(col(sourceCol), col("n_tokens_total"), col("target_tokens"),
        col("epochs_full"), col("partial_permille"), col("planned_tokens"))
  }

  /** Deterministic TRAINING ORDER — the data-loader contract at the
    * very end of the pipeline: a seeded global shuffle of the corpus
    * (epoch-dependent, so every epoch reshuffles) plus round-robin
    * worker sharding. order_rank = the [[Packing.globalRowNumber]]
    * two-pass rank over (md5-60(key ‖ seed ‖ '#' ‖ epoch), key) — the
    * repo's shared seeded-hash construction, so the permutation is
    * reproducible at any parallelism and restatable by any engine
    * (q162); worker = order_rank mod numWorkers and worker_pos =
    * order_rank div numWorkers give each worker a contiguous position
    * sequence over an interleaved shard (the standard
    * distributed-sampler shape).
    *
    * @return input columns + (order_rank, worker, worker_pos) */
  def trainOrder(df: DataFrame, keyCol: String, epoch: Int,
      numWorkers: Int, seed: String): DataFrame = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    require(numWorkers >= 1, s"numWorkers must be >= 1, got $numWorkers")
    require(!df.columns.contains("__r"),
      "input must not already carry a __r column")
    Packing.globalRowNumber(
      df.withColumn("__r", Dedup.md5Hash60(concat(
        col(keyCol).cast("string"), lit(seed), lit("#"),
        lit(epoch.toString)))),
      Seq(col("__r").asc, col(keyCol).asc), "order_rank")
      .drop("__r")
      .withColumn("worker", pmod(col("order_rank"), lit(numWorkers.toLong)))
      .withColumn("worker_pos",
        expr(s"order_rank div ${numWorkers}L"))
  }

  def mixtureSchedule(df: DataFrame, idCol: String, sourceCol: String,
      weightsPermille: Map[String, Long], defaultPermille: Long,
      seed: String): DataFrame = {
    require(defaultPermille >= 0 && weightsPermille.values.forall(_ >= 0),
      "mixture weights must be non-negative")
    val weight = weightsPermille.foldLeft(lit(defaultPermille)) {
      case (acc, (src, w)) =>
        when(col(sourceCol) === src, lit(w)).otherwise(acc)
    }
    val base = df.select(col(idCol), col(sourceCol),
        weight.cast("long").as("__w"),
        Dedup.md5Hash60(concat(col(idCol).cast("string"), lit(seed)))
          .as("__r"))
      .filter(col("__w") > 0)
    val ranked = Packing.globalRowNumber(base,
      Seq(col(sourceCol).asc, col("__r").asc, col(idCol).asc), "__g")
    val mins = ranked.groupBy(col(sourceCol))
      .agg(min(col("__g")).as("__min"))
    val keyed = ranked.join(broadcast(mins), sourceCol :: Nil)
      .withColumn("__k",
        expr("((__g - __min + 1L) * 1000000000L) div __w"))
    Packing.globalRowNumber(
        keyed.select(col(idCol), col(sourceCol), col("__k")),
        Seq(col("__k").asc, col(sourceCol).asc, col(idCol).asc),
        "position")
      .select(col(idCol), col(sourceCol), col("position"))
  }

  /** Horvitz–Thompson per-group total estimation from the
    * deterministic hash sample: every key lands in the sample with
    * inclusion probability π = samplePermille/1000 (the [[hashBucket]]
    * membership rule, so the "random" sample is reproducible and
    * engine-portable), and the estimated group total is the sampled
    * sum divided by π — unbiased (Horvitz & Thompson 1952), exact
    * integer arithmetic throughout. This is the survey-sampling shape
    * of approximate query processing: at 100 TB the dashboard scans
    * the 1%-sample table (π is a property of the KEY, so the sample is
    * a once-materialized consistent subset usable by every query), and
    * the estimate's integer math matches any engine bit for bit.
    *
    * One full-scan pass here computes BOTH the estimate and the exact
    * total via conditional aggregation — the exact side is the audit
    * column a correctness gate wants; a production estimate-only call
    * reads just the sample table and skips it. err_pm is the signed
    * estimate error in per-mille of the exact total (0 when exact
    * is 0), with the q205 sign-symmetric division so a negative-sum
    * group divides identically in Spark (`div` truncates) and DuckDB
    * (`//` floors).
    *
    * @param valCol integer (cents-style) measure column
    * @return (groupCol, n_total, n_sampled, exact_cents, est_cents,
    *         err_pm) */
  def htGroupEstimate(df: DataFrame, groupCol: String, valCol: String,
      idCol: String, seed: String, samplePermille: Int): DataFrame = {
    require(samplePermille >= 1 && samplePermille <= 1000,
      s"samplePermille must be in [1, 1000], got $samplePermille")
    val in = when(
      hashBucket(col(idCol), seed, 1000) < samplePermille, 1L)
      .otherwise(0L)
    df.withColumn("__in", in)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_total"),
        sum(col("__in")).as("n_sampled"),
        sum(col(valCol)).as("exact_cents"),
        sum(col(valCol) * col("__in")).as("__sampled_cents"))
      .withColumn("est_cents",
        expr(s"(__sampled_cents * 1000L) div ${samplePermille}L"))
      .withColumn("__diff_pm", (col("est_cents") - col("exact_cents"))
        * lit(1000L))
      .withColumn("err_pm",
        when(col("exact_cents") === 0L, lit(0L))
          .otherwise(expr(
            """CASE WHEN __diff_pm >= 0
              | THEN __diff_pm div abs(exact_cents)
              | ELSE -((-__diff_pm) div abs(exact_cents)) END""".stripMargin)))
      .select(col(groupCol), col("n_total"), col("n_sampled"),
        col("exact_cents"), col("est_cents"), col("err_pm"))
  }

  /** Largest-remainder (Hamilton) apportionment: split an integer
    * `total` across groups proportional to an exact weight sum, with
    * Σalloc == total GUARANTEED — the property `div`-based allocation
    * ([[epochAllocation]]'s per-mille plan) deliberately trades away.
    * base_g = (total·w_g) div W; the Σbase shortfall (< #groups units)
    * goes +1 each to the groups with the largest remainders
    * (total·w_g) mod W, ties broken by group key ascending so the
    * split is a pure function of the weights.
    *
    * Scale shape: one map-side-combined per-group weight sum; the
    * remainder ranking is a window over the GROUP-sized result (one
    * row per group — model-sized, not row-sized), so the single
    * partition it funnels through holds #groups rows, never data.
    *
    * @return (groupCol, weight, alloc), Σalloc = total */
  def largestRemainder(df: DataFrame, groupCol: String,
      weightCol: Column, total: Long): DataFrame = {
    require(total >= 0, s"total must be >= 0, got $total")
    import org.apache.spark.sql.expressions.Window
    val w = df.groupBy(col(groupCol))
      .agg(sum(weightCol.cast("long")).as("weight"))
    val base = w.crossJoin(
        broadcast(w.agg(sum(col("weight")).as("__tw"))))
      .withColumn("__base", expr(s"(${total}L * weight) div __tw"))
      .withColumn("__rem", expr(s"(${total}L * weight) % __tw"))
    val extra = base.crossJoin(
      broadcast(base.agg((lit(total) - sum(col("__base")))
        .as("__extra"))))
    val win = Window.orderBy(col("__rem").desc, col(groupCol).asc)
    extra.withColumn("__rank", row_number().over(win))
      .select(col(groupCol), col("weight"),
        (col("__base") +
          when(col("__rank") <= col("__extra"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Poisson(1) bootstrap — confidence intervals WITHOUT resampling
    * data movement: each row joins every replica with an i.i.d.-ish
    * Poisson(1) weight drawn from a seeded md5 hash (the classic
    * large-scale approximation to multinomial resampling: n draws of
    * n rows ≈ independent Poisson(1) multiplicities), so B replica
    * means come out of ONE scan + one map-side-combined aggregation —
    * no per-replica shuffles, no driver-side sample materialization.
    * CI = empirical quantiles of the returned replica means.
    *
    * Weights invert the Poisson(1) CDF at 1e−6 granularity (fixed
    * integer thresholds, capped at 8 — P(X > 8) < 1.1e−6); the hash is
    * the portable 60-bit md5 ([[Dedup.md5Hash60]]), so any engine
    * restates every weight, sum, and mean bit-exactly.
    *
    * @return one row per replica: (rep, n = Σw, s = Σw·v,
    *         mean_c = s div n sign-guarded, NULL when n = 0) */
  def poissonBootstrap(df: DataFrame, idCol: String, valCol: String,
      reps: Int, seed: String): DataFrame = {
    require(reps >= 1 && reps <= 1024, s"reps out of range: $reps")
    val spark = df.sparkSession
    val r = spark.range(reps).select(col("id").as("rep"))
    val h = Dedup.md5Hash60(concat(col(idCol).cast("string"),
      lit("|" + seed + "|"), col("rep").cast("string"))) % 1000000L
    // Poisson(1) CDF × 1e6: 367879, 735759, 919699, 981012, 996340,
    // 999406, 999917, 999990 (then cap 8)
    val w = when(h < 367879L, 0L).when(h < 735759L, 1L)
      .when(h < 919699L, 2L).when(h < 981012L, 3L)
      .when(h < 996340L, 4L).when(h < 999406L, 5L)
      .when(h < 999917L, 6L).when(h < 999990L, 7L).otherwise(8L)
    df.select(col(idCol), col(valCol).cast("long").as("__v"))
      .crossJoin(broadcast(r))
      .withColumn("__w", w)
      .groupBy(col("rep"))
      .agg(sum(col("__w")).as("n"),
        sum(col("__w") * col("__v")).as("s"))
      .withColumn("mean_c", expr(
        """CASE WHEN n = 0 THEN NULL
          |  WHEN s >= 0 THEN s div n
          |  ELSE -((-s) div n) END""".stripMargin))
  }
}
